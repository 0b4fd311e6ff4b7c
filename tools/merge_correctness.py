"""Merge correctness artifacts: a base full-sweep JSON plus fixup runs.

The r13 sf10 sweep ran against the round-start snapshot; ops fixed or
added mid-round were re-verified by targeted runs.  This merges those
fixup artifacts over the base (later files win per op id), so the final
CORRECTNESS_full_r{N}_sf10.json reflects HEAD.

Usage: python tools/merge_correctness.py OUT BASE FIXUP [FIXUP...]
"""

from __future__ import annotations

import json
import sys


def main() -> int:
    out, base, *fixups = sys.argv[1:]
    with open(base) as fh:
        doc = json.load(fh)
    for f in fixups:
        with open(f) as fh:
            doc.update(json.load(fh))
    n_pass = sum(1 for v in doc.values()
                 if v.get("hash_match") or (v.get("err") == "no_oracle"))
    with open(out, "w") as fh:
        json.dump(doc, fh, indent=1)
    print(f"wrote {out}: {len(doc)} ops, {n_pass} hash-pass")
    return 0


if __name__ == "__main__":
    sys.exit(main())
