"""Stream-static enrichment join (SURVEY §2.11 extension).

The canonical streaming ingest shape: an unbounded fact stream joined to a
bounded dimension (user profile, device registry, concept dictionary). In
Structured Streaming a stream-static equi-join is stateless — each
micro-batch joins against the current static relation, no watermark or
state store involved — so the only scale question is the join strategy.
We broadcast the dimension explicitly: the stream side then never
shuffles, which keeps per-batch latency flat regardless of stream volume.
For dimensions too large to broadcast, pre-bucket the static side on the
join key (sources/bucketing.py) so only the stream side exchanges.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame


def enrich_stream(
    stream_df: DataFrame,
    dim_df: DataFrame,
    on: list[str] | None = None,
    how: str = "left",
    broadcast_dim: bool = True,
) -> DataFrame:
    """Join a (possibly streaming) fact frame to a static dimension.

    Works identically on static inputs (batch-first design: the parity
    test runs the same composition both ways).
    """
    dim = F.broadcast(dim_df) if broadcast_dim else dim_df
    return stream_df.join(dim, on=on, how=how)
