"""Declared-query plans: the engine's DuckDB-oracle-checked query surface.

Importing this package populates the registry; modules self-register via
the :func:`registry.register` decorator. Registry order == driver
correctness-pass order, so ordering is deliberate:

1. ``reference_queries`` (q01-q10) — the SURVEY §2o core — registers
   FIRST so those rows are never lost to a driver budget cut.
2. The driver's per-round correctness pass has a row budget (round 1
   truncated after 50 rows), so queries that already earned a passing
   CORRECTNESS row in ANY previous round are rotated to the BACK of the
   registry: never-checked queries always get first claim on the budget.
   The rowed set is read from the driver's own ``CORRECTNESS_r*.json``
   files at import, so the rotation stays correct every round with no
   hand-maintained list. A row counts as earned only when it passed
   (``hash_match`` true, or a rows-only check that returned rows);
   failed/errored rows stay near the front to re-earn a green row.
"""

from __future__ import annotations

import glob
import json
import os
import re

from . import reference_queries  # noqa: F401  (q01-q10 first)
from . import analytics  # noqa: F401
from . import analytics_ext  # noqa: F401
from . import analytics_wave3  # noqa: F401
from . import analytics_wave4  # noqa: F401
from . import analytics_wave5  # noqa: F401
from . import analytics_wave6  # noqa: F401
from . import analytics_wave7  # noqa: F401
from . import analytics_wave8  # noqa: F401
from . import analytics_wave9  # noqa: F401
from . import analytics_wave10  # noqa: F401
from . import analytics_wave11  # noqa: F401
from . import analytics_wave12  # noqa: F401
from . import analytics_wave13  # noqa: F401
from . import analytics_wave14  # noqa: F401
from . import analytics_wave15  # noqa: F401
from . import analytics_wave16  # noqa: F401
from . import llm_ops  # noqa: F401
from .registry import (FIXED_INPUT, REGISTRY, oracle_sql,  # noqa: F401
                       queries, register)


def _previously_green() -> dict[str, int]:
    """name → LATEST round whose driver row certified the query green
    (hash_match, or non-empty rows-only). Keys = the previously-green
    set; values drive oldest-certification-first re-checking so driver
    coverage ages uniformly once every query has a row."""
    rowed: dict[str, int] = {}
    root = os.path.abspath(os.path.join(os.path.dirname(__file__),
                                        "..", ".."))
    for path in sorted(glob.glob(os.path.join(root, "CORRECTNESS_r*.json"))):
        try:
            with open(path) as f:
                data = json.load(f)
        except Exception:
            continue
        if not isinstance(data, dict):
            continue
        m = re.search(r"CORRECTNESS_r(\d+)", os.path.basename(path))
        rnd = int(m.group(1)) if m else 0
        for name, row in data.items():
            if not isinstance(row, dict):
                continue
            if row.get("hash_match") is True:
                rowed[name] = max(rowed.get(name, 0), rnd)
            elif (row.get("err") == "no_oracle"
                  and (row.get("spark_rows") or 0) > 0
                  # a rows-only green certifies only the weaker check:
                  # if the query has GAINED a DuckDB oracle since, it
                  # re-queues as never-certified so the driver earns it
                  # a full value-hash row (e.g. g02 in round 5)
                  and (name not in REGISTRY
                       or REGISTRY[name].oracle is None)):
                rowed[name] = max(rowed.get(name, 0), rnd)
    return rowed


_green = _previously_green()
# Within the never-rowed set, oracle-backed queries outrank rows-only
# ones: a driver budget slot spent on an oracle query earns a full
# value-hash row, while a rows-only query earns only the weaker
# non-empty check — so the weaker checks queue behind the stronger.
for _name in [n for n, s in REGISTRY.items()
              if n not in _green and s.oracle is None]:
    REGISTRY[_name] = REGISTRY.pop(_name)
# Previously-green queries queue last, OLDEST certification first (ties
# keep registry order): once everything has a row, leftover driver
# budget re-certifies the stalest rows so coverage ages uniformly.
for _name in sorted([n for n in REGISTRY if n in _green],
                    key=lambda n: _green[n]):
    REGISTRY[_name] = REGISTRY.pop(_name)  # move to end, keep spec

__all__ = ["REGISTRY", "queries", "oracle_sql", "register"]
