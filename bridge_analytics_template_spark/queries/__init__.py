"""Declared query inventory — every operator from SURVEY.md §2 gets a
``@query``-registered PySpark implementation and (where SQL-expressible) a
DuckDB oracle SQL string. ``__spark_entry__.py`` exposes this registry to the
verification driver.
"""

from __future__ import annotations

from .registry import ORACLES, QUERIES, query  # noqa: F401

# Import for side effect: each module registers its queries.
from . import relational  # noqa: E402,F401
from . import joins  # noqa: E402,F401
from . import aggregates  # noqa: E402,F401
from . import windows  # noqa: E402,F401
from . import scalar_functions  # noqa: E402,F401
from . import bridge  # noqa: E402,F401
from . import llm  # noqa: E402,F401
from . import streaming  # noqa: E402,F401
from . import udf_surface  # noqa: E402,F401
from . import sql_api  # noqa: E402,F401
from . import breadth  # noqa: E402,F401
from . import pipeline  # noqa: E402,F401
from . import training  # noqa: E402,F401
from . import curation  # noqa: E402,F401
from . import tpch_shapes  # noqa: E402,F401
from . import stats  # noqa: E402,F401
