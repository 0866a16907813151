"""Compression-ratio quality signal (Dolma / RedPajama-style): the
zlib-compressed size over the raw size. Highly repetitive or templated
text compresses far below typical prose, making the ratio a cheap,
language-agnostic quality/boilerplate detector that catches what
token-level rules miss (the Dolma pipeline ships exactly this filter).

No reference counterpart; beyond-reference training-data family.

Execution: Arrow-batched ``mapInPandas`` — zlib is C-speed and the
batch crossing amortizes (one Python roundtrip per ~10k rows), the same
UDF-budget rationale as the embedder. zlib output length for a fixed
(input, level) is deterministic for a given zlib build, and the inline
driver-checked query computes its expected VALUES with the SAME
interpreter's zlib, so the oracle is exact by construction.
"""

from __future__ import annotations

import zlib
from typing import Iterator

import pandas as pd

from pyspark.sql import DataFrame

LEVEL = 6


def compressed_size(text: str) -> int:
    """zlib-compressed byte length of the utf-8 text at the fixed level
    (shared by the executor kernel and the known-answer oracle)."""
    return len(zlib.compress(text.encode("utf-8"), LEVEL))


def compression_ratios(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """(id, n_bytes, n_compressed, ratio) per document; ratio =
    compressed/raw. Arrow-batched; only (id, text) cross the boundary."""
    schema = f"{id_col} long, n_bytes long, n_compressed long, ratio double"

    def kernel(pdfs: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in pdfs:
            raw = pdf[text_col].str.encode("utf-8")
            n_bytes = raw.str.len()
            n_comp = raw.map(lambda b: len(zlib.compress(b, LEVEL)))
            # empty-text guard: int/0 in pandas yields inf, which would
            # poison every avg/min downstream; an empty doc is defined
            # as ratio 1.0 (incompressible), mirroring ascii_ratio's
            # explicit empty-string handling
            ratio = (n_comp / n_bytes.where(n_bytes > 0)).fillna(1.0).round(6)
            yield pd.DataFrame(
                {
                    id_col: pdf[id_col],
                    "n_bytes": n_bytes,
                    "n_compressed": n_comp,
                    "ratio": ratio,
                }
            )

    return df.select(id_col, text_col).mapInPandas(kernel, schema=schema)
