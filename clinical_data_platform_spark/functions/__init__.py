"""Column-expression library: every helper returns a pyspark Column built
from JVM builtins (whole-stage-codegen friendly); no Python UDFs here.
"""

from .scalars import erf_approx, logistic, normal_sf, surrogate_key  # noqa: F401
from .text import (  # noqa: F401
    normalize_ws,
    punct_ratio,
    stopword_ratio,
    token_count,
    tokens,
)
from .vectors import cosine_similarity, dot, l2_norm  # noqa: F401
