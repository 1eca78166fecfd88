"""Python UDTF surface (Spark 4): one row in, N typed rows out, usable
from SQL with LATERAL.

The engine prefers JVM expressions for 1->N expansion (explode over
sequence/slice — see plans/trainprep.chunk_documents_frame); a UDTF is
the escape hatch when the expansion logic is genuinely Python (a parser,
a tokenizer with state). Arrow-batched like pandas UDFs, but row-at-a-
time eval — keep it off the hot path.
"""

from __future__ import annotations

import re

from pyspark.sql.functions import udtf


@udtf(returnType="sent_id: int, sentence: string, n_words: int")
class SplitSentences:
    """Sentence splitter: terminal punctuation boundaries, emits one row
    per non-empty sentence with its word count."""

    def eval(self, text: str):  # noqa: ANN001 - UDTF contract
        if not text:
            return
        for i, raw in enumerate(re.split(r"[.!?]+\s*", text)):
            s = raw.strip()
            if s:
                yield i, s, len(s.split())


def register(spark) -> None:
    spark.udtf.register("split_sentences", SplitSentences)
