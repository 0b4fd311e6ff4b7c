"""Merge a fresh partial SCALE artifact over the prior round's artifact.

The per-round scale probe re-measures only the ops CHANGED that round
(SCALE_OPS_ONLY) — everything untouched carries its last measurement,
tagged ``carried_from`` with the round that actually measured it (the
r11 convention).  This script does the merge mechanically:

- ops: prior entries keep their original ``carried_from`` origin (or
  gain the prior artifact's name); fresh entries replace them tagged
  ``remeasured: "<round> (changed this round)"``;
- plans: taken from the fresh run (always regenerated on the big sf);
- density probes: carried from the prior artifact verbatim unless the
  fresh run produced them;
- extra sections (streaming/skew rehearsals, notes): injected from
  ``--section name=path.json`` args, each file holding one JSON object.

Usage:
  python tools/merge_scale.py PRIOR.json FRESH.json OUT.json ROUND_TAG \\
      [--section streaming_rehearsal_sf1=rehearsal.json] ...
"""

from __future__ import annotations

import json
import os
import sys


def main() -> int:
    args = [a for a in sys.argv[1:] if not a.startswith("--section")]
    sections = {}
    argv = sys.argv[1:]
    for i, a in enumerate(argv):
        if a == "--section" and i + 1 < len(argv):
            name, path = argv[i + 1].split("=", 1)
            with open(path) as fh:
                sections[name] = json.load(fh)
    prior_path, fresh_path, out_path, round_tag = args[:4]

    with open(prior_path) as fh:
        prior = json.load(fh)
    with open(fresh_path) as fh:
        fresh = json.load(fh)

    prior_name = os.path.basename(prior_path).removesuffix(".json")
    ops = {}
    for name, o in prior["ops"].items():
        o = dict(o)
        o.pop("remeasured", None)
        o.setdefault("carried_from", prior_name.replace(".json", ""))
        ops[name] = o
    for name, o in fresh.get("ops", {}).items():
        o = dict(o)
        o.pop("carried_from", None)
        o["remeasured"] = f"{round_tag} (changed this round)"
        ops[name] = o

    out = dict(prior)
    out["ops"] = ops
    if fresh.get("plans"):
        out["plans"] = fresh["plans"]
    for key in ("density_probe", "density_probe_30x"):
        if fresh.get(key, {}).get("ops"):
            out[key] = fresh[key]
    out["n_superlinear"] = sum(
        1 for o in ops.values() if o.get("flag") == "superlinear")
    out["supersedes"] = sorted(
        set(prior.get("supersedes", [])) | {os.path.basename(prior_path)})
    out.update(sections)
    with open(out_path, "w") as fh:
        json.dump(out, fh, indent=1)
    print(f"wrote {out_path}: {len(ops)} ops "
          f"({sum(1 for o in ops.values() if 'remeasured' in o)} fresh), "
          f"{out['n_superlinear']} superlinear, "
          f"sections {sorted(sections)}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
