"""The census tokenizer — ONE definition of "lowercase, split on
single spaces, drop empties", shared by every operator whose parity
contract depends on tokenizing identically: the corpus statistics
queries (perplexity, vocab, tf-idf), the substring span dedup, the
corpus-drift census, and the streaming drift monitor (whose reference
head must be byte-identical to the batch census's).  A tokenizer tweak
made here changes all of them together; made anywhere else it silently
desynchronizes a monitor from the census it claims to mirror.

(The near-dup shingle tokenizer in ``operators/dedup.py`` is
DELIBERATELY different — whitespace-run splitting with null coalesce —
and must not be merged into this one.)
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F


def lower_tokens(col: str | Column = "text") -> Column:
    """``array<string>`` of the census tokens of ``col`` (may contain
    empty strings where the text has runs of spaces — array consumers
    that care filter them; see ``census_token_stream``)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.split(F.lower(c), " ")


def census_token_stream(docs: DataFrame, *keys: str) -> DataFrame:
    """One row per (``*keys``, tok) with empties dropped — the exploded
    census token stream over a frame with a ``text`` column."""
    return docs.select(
        *keys, F.explode(lower_tokens()).alias("tok")
    ).where(F.col("tok") != "")
