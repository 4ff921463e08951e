"""Independent single-node reference implementations used to GENERATE
oracle SQL for operators plain SQL cannot express (hash-seeded, iterative,
or numpy-kernel queries: xxhash64 surfaces, SimHash, k-means, the ANN tier,
BPE training, PCA).

Each generator re-derives the expected answer from the fixture parquet with
a NON-Spark implementation (pure Python / numpy / pyarrow — no JVM, no
DataFrame API) and emits it as a DuckDB ``VALUES`` query. The registry
stores the generator as a callable; ``__spark_entry__.oracle_sql()``
resolves it when the correctness gate asks — so the comparison is Spark's
distributed execution vs a from-scratch local reference, the same
two-engines contract as the handwritten SQL oracles.

The corpus the generators read defaults to the driver's documented gate
fixture (``/root/testdata/sf0.01``); ``tools/check_oracle.py`` points them
at whatever ``--sf`` it is checking via ``SPARK_GRAFT_ORACLE_SF_DIR``.
"""

from __future__ import annotations

import os

GATE_SF_DIR = "/root/testdata/sf0.01"


def oracle_sf_dir() -> str:
    return os.environ.get("SPARK_GRAFT_ORACLE_SF_DIR", GATE_SF_DIR)
