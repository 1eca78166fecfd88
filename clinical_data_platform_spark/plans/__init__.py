"""Declarative query plans over the test corpus.

Each module registers named queries via :mod:`.registry`. A query is a
callable ``(spark, sf_dir) -> DataFrame`` plus (usually) a DuckDB oracle SQL
string computing the same result — the driver's correctness gate runs both
and hash-compares.

Import side effects register the queries; ``all_queries()`` /
``all_oracles()`` aggregate them for ``__spark_entry__``.
"""

from __future__ import annotations

from .registry import QUERIES, ORACLES, all_oracles, all_queries  # noqa: F401

# Import for registration side effects.
from . import relational  # noqa: E402,F401
from . import validation  # noqa: E402,F401
from . import stats  # noqa: E402,F401
from . import textops  # noqa: E402,F401
from . import vectorops  # noqa: E402,F401
from . import events  # noqa: E402,F401
from . import streamops  # noqa: E402,F401
from . import advanced  # noqa: E402,F401
from . import tpch_deep  # noqa: E402,F401
from . import trainprep  # noqa: E402,F401
from . import corpusqc  # noqa: E402,F401
from . import clustering  # noqa: E402,F401
from . import collocations  # noqa: E402,F401
from . import contentfilter  # noqa: E402,F401
from . import sketches  # noqa: E402,F401
from . import graphops  # noqa: E402,F401
from . import matrixops  # noqa: E402,F401
from . import survival  # noqa: E402,F401
from . import spatial  # noqa: E402,F401
from . import layout  # noqa: E402,F401
from . import quantization  # noqa: E402,F401

# curation composes REGISTERED oracles (it reads ORACLES at import time),
# so it must import after every module whose oracle it embeds
from . import curation  # noqa: E402,F401
