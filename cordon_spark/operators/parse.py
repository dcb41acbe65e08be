"""Graft parse stage: vectorized regex/grok template extraction.

Template semantics are the reference benchmark's line->template
attribution (benchmark/evaluate.py:131-179): a wildcard template string
whose `[*]` holes match lazily — compiled as
`re.escape(template).replace(r'\\[\\*\\]', '.*?')` then `pattern.search`,
first match in template order wins (evaluate.py:144-151, :168-179).

Spark spelling: an Arrow pandas UDF that applies each compiled pattern
to the whole batch via pandas' vectorized `Series.str.contains` — one
C-loop pass per template, no per-row Python (input_hint requirement).
Unmatched text -> template_id null (the parse-failure lineage counter
picks these up)."""

from __future__ import annotations

import re
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, functions as F, types as T


def compile_templates(templates: list[tuple[str, str]]) -> list[tuple[str, str]]:
    """[(template_id, wildcard template)] -> [(template_id, regex)].
    Exactly the reference's wildcard compilation (evaluate.py:144-151)."""
    out = []
    for template_id, template in templates:
        pattern = re.escape(template).replace(r"\[\*\]", ".*?")
        out.append((template_id, pattern))
    return out


def extract_templates(
    df: DataFrame,
    templates: list[tuple[str, str]],
    text_col: str = "text",
    out_col: str = "template_id",
) -> DataFrame:
    compiled = compile_templates(templates)

    @F.pandas_udf(T.StringType())
    def match_udf(batches: Iterator[pd.Series]) -> Iterator[pd.Series]:
        pats = [(tid, re.compile(rx)) for tid, rx in compiled]
        for s in batches:
            s = s.fillna("")
            result = pd.Series([None] * len(s), index=s.index, dtype=object)
            unmatched = pd.Series(True, index=s.index)
            for tid, pat in pats:
                if not unmatched.any():
                    break
                hits = s[unmatched].str.contains(pat, regex=True)
                hit_idx = hits[hits].index
                result[hit_idx] = tid
                unmatched[hit_idx] = False
            yield result

    return df.withColumn(out_col, match_udf(F.col(text_col)))
