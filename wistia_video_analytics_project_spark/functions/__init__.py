"""Column-level function library — the engine's scalar/array surface.

One import point for every reusable Column -> Column function the
operators are built from (SURVEY.md §2.8 inventory + extension tier).
All JVM-side built-ins unless noted.
"""

from ..operators.conform import (  # noqa: F401
    classify_channel,
    epoch_to_timestamp,
    media_url,
    null_or_empty,
    surrogate_key,
)
from ..operators.scale import zorder_key  # noqa: F401
from ..operators.similarity import cosine, dot, norm  # noqa: F401
from ..operators.text import (  # noqa: F401
    alpha_ratio,
    bpe_ish_token_count,
    fingerprint,
    lang_guess,
    normalized_text,
    punct_count,
    quality_score,
    token_count,
    tokens,
)
