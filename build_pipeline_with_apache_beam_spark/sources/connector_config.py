"""Externalized connector configuration: no connection literal in code.

The reference embeds a full credential URI in source
(/root/reference/retrieval.py:172 hard-codes user:password@host) — the one
operational anti-pattern a connector layer must close.  The engine's rule:
**operator code never contains endpoints or credentials**; every connector
resolves its options at call time through this layered lookup, most
specific wins:

1. explicit per-call overrides (programmatic),
2. environment: ``SPARK_GRAFT_<CONNECTOR>_<OPTION>`` (deploy-time injection,
   the container/secret-manager path),
3. a JSON config file at ``$SPARK_GRAFT_CONNECTOR_CONFIG`` with
   ``{"<connector>": {"<option>": ...}}`` (checked-in per-environment
   profiles),
4. the connector's declared defaults.

Resolved dicts plug straight into ``spark.read.format(...).options(**o)``.
Secret-valued keys are never logged: ``describe`` masks them, and a CI test
greps the package for credential/endpoint literals (tests/test_connector_config.py).
"""

from __future__ import annotations

import json
import os
from collections.abc import Mapping

# option names whose values must never appear in logs or error messages
SECRET_KEYS = frozenset({"auth_token", "password", "secret", "uri", "key"})

_ENV_PREFIX = "SPARK_GRAFT"
_CONFIG_FILE_ENV = "SPARK_GRAFT_CONNECTOR_CONFIG"


def _file_layer(connector: str) -> dict[str, str]:
    path = os.environ.get(_CONFIG_FILE_ENV)
    if not path or not os.path.exists(path):
        return {}
    with open(path) as fh:
        profiles = json.load(fh)
    layer = profiles.get(connector, {})
    return {str(k).lower(): str(v) for k, v in layer.items()}


def _env_layer(connector: str, env: Mapping[str, str]) -> dict[str, str]:
    prefix = f"{_ENV_PREFIX}_{connector.upper()}_"
    return {
        k[len(prefix):].lower(): v
        for k, v in env.items() if k.startswith(prefix)
    }


def resolve_options(connector: str,
                    defaults: Mapping[str, str] | None = None,
                    overrides: Mapping[str, str] | None = None,
                    env: Mapping[str, str] | None = None) -> dict[str, str]:
    """Layered option resolution for one connector (see module docstring)."""
    env = os.environ if env is None else env
    out: dict[str, str] = {}
    out.update({k.lower(): str(v) for k, v in (defaults or {}).items()})
    out.update(_file_layer(connector))
    out.update(_env_layer(connector, env))
    out.update({k.lower(): str(v) for k, v in (overrides or {}).items()
                if v is not None})
    return out


def describe(options: Mapping[str, str]) -> dict[str, str]:
    """Log-safe view: secret values masked, never round-trippable."""
    return {k: ("****" if k.lower() in SECRET_KEYS and v else v)
            for k, v in options.items()}
