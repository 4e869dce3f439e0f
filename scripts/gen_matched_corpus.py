"""Generate a 50k-doc corpus statistically matched to the driver's
documents table, for scale A/B of the dedup/text operators when no
driver-generated large sf dir exists (guide §1: measure at a size
where the effect shows).  Matched properties (measured from
/root/testdata/sf0.1/documents.parquet): 30-word vocabulary drawn
uniformly, doc length uniform 10-100 tokens, ~3% planted near-dup
copies (single-token edit), same column schema.  Deterministic
(seed 42).  NOT part of any bench or oracle path.

Usage: python scripts/gen_matched_corpus.py [/root/sfbig]
"""

import os
import sys

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq


def main() -> None:
    out_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/sfbig"
    rng = np.random.default_rng(42)
    words = (
        "spark window merge table column vector stream value data small "
        "join filter big group hash customer sort order slow line part "
        "fast row the agg key query a scan batch"
    ).split()
    assert len(words) == 30
    n = 50_000
    langs = ["en", "zh", "de", "fr", "es"]
    ids, texts, lang_col, srcs, nchars = [], [], [], [], []
    i = 0
    while i < n:
        length = int(rng.integers(10, 101))
        ws = [words[j] for j in rng.integers(0, 30, length)]
        t = " ".join(ws)
        ids.append(i)
        texts.append(t)
        lang_col.append(langs[int(rng.integers(0, 5))])
        srcs.append(f"src{int(rng.integers(0, 20))}")
        nchars.append(len(t))
        i += 1
        if rng.random() < 0.03 and i < n:
            ws2 = list(ws)
            ws2[int(rng.integers(0, len(ws2)))] = "dup"
            t2 = " ".join(ws2)
            ids.append(i)
            texts.append(t2)
            lang_col.append(lang_col[-1])
            srcs.append(srcs[-1])
            nchars.append(len(t2))
            i += 1
    os.makedirs(out_dir, exist_ok=True)
    tbl = pa.table(
        {
            "doc_id": pa.array(ids, pa.int64()),
            "text": texts,
            "lang": lang_col,
            "source": srcs,
            "n_chars": pa.array(nchars, pa.int64()),
        }
    )
    pq.write_table(tbl, os.path.join(out_dir, "documents.parquet"))
    print(f"wrote {len(ids)} docs to {out_dir}/documents.parquet")


if __name__ == "__main__":
    main()
