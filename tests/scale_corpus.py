"""Synthesized scale corpora for the decade/100× sweeps.

Builds an N× corpus by unioning sf0.1 documents/embeddings with N-1
deterministic BIJECTIVE perturbed copies. The perturbation rules are
the part that makes growth assertions meaningful — copies must not be
near-dups of their originals or of each other, or the corpus itself
grows quadratically-many true pairs and no engine could show linear
growth:

- documents: a per-copy seeded PERMUTATION of each character class
  ([a-z], [A-Z], [0-9]) — a bijection on characters, so every char
  n-gram / token shingle / winnowing fingerprint structure is EXACTLY
  preserved within a copy while every alnum-bearing gram is
  copy-specific. (A token SUFFIX failed here: grams inside long tokens
  were copy-invariant, inflating corpus-wide document frequencies; a
  pure alphabet ROTATION — the pre-r5 rule — has only 26 distinct
  values, so any copy count > 26 would collide copies into mutual
  near-dups. Seeded permutations keep the same invariants with
  26!·26!·10! headroom.)
- embeddings: a per-copy deterministic ±1 sign mask — sign²=1
  preserves every intra-copy dot product and norm exactly, while
  inter-copy dots decorrelate pseudo-randomly. (A cyclic SHIFT failed:
  the LSH plane family's coefficients are periodic in the dimension
  index, so shifted copies collided into the same buckets.)

N× data therefore carries ~N× true near-dup pairs, and a correct
linear engine should produce ~N× candidates.
"""

from __future__ import annotations

import random

from pyspark.sql import SparkSession
from pyspark.sql import functions as F

from postgresql_transfer_tool_spark.catalog import load_table

SF_MID = "/root/testdata/sf0.1"

#: vec_id/doc_id stride between copies — also the copy-recovery key
#: (copy = id // ID_STRIDE) used by the diagnosis decomposition
ID_STRIDE = 10_000_000

_LOWER = "abcdefghijklmnopqrstuvwxyz"
_UPPER = _LOWER.upper()
_DIGITS = "0123456789"


def permuted_alphabet(k: int) -> tuple[str, str]:
    """Per-copy class-preserving character bijection (identity for
    k=0). Seeded Mersenne-Twister shuffles are deterministic and
    platform-stable, and distinct copies get distinct permutations with
    overwhelming probability (26! per letter class)."""
    src = _LOWER + _UPPER + _DIGITS
    if k == 0:
        return src, src
    rng = random.Random(0xC0FFEE + k)
    parts = []
    for cls in (_LOWER, _UPPER, _DIGITS):
        chars = list(cls)
        rng.shuffle(chars)
        parts.append("".join(chars))
    return src, "".join(parts)


def sign_mask(k: int, dim: int) -> list[float]:
    """Deterministic ±1 per (copy, dim) from md5 parity (identity mask
    for k=0). An LCG-style mix failed here at 100 copies: bit-7 of a
    linear form collides masks for distinct k (caught by
    build_scaled_corpus's pairwise-distinctness assertion); md5 bits
    are effectively random, so 100 copies of a 64-dim mask space
    collide with probability ~2⁻⁵¹."""
    import hashlib

    if k == 0:
        return [1.0] * dim
    return [
        1.0 if hashlib.md5(f"{k}:{d}".encode()).digest()[0] % 2 == 0 else -1.0
        for d in range(dim)
    ]


def build_scaled_corpus(
    spark: SparkSession,
    out_dir: str,
    copies: int,
    n_files: int = 32,
    src_dir: str = SF_MID,
) -> None:
    """Write a ``copies``× documents/embeddings corpus under
    ``out_dir``. ``n_files`` controls output split count — map-only
    stages parallelize at split granularity, so write enough files to
    feed every core (4 files once serialized a 32-thread stage)."""
    assert copies * max(5000, 2000) < ID_STRIDE
    docs = load_table(spark, src_dir, "documents")
    embs = load_table(spark, src_dir, "embeddings")
    dim = len(embs.select("embedding").first()[0])

    # masks must be pairwise distinct or two copies collapse into
    # exact embedding dups (quadratic true pairs)
    masks = [tuple(sign_mask(k, dim)) for k in range(copies)]
    assert len(set(masks)) == copies, "sign-mask collision"

    doc_parts, emb_parts = [], []
    for k in range(copies):
        if k == 0:
            doc_parts.append(docs)
            emb_parts.append(embs)
            continue
        src, dst = permuted_alphabet(k)
        doc_parts.append(
            docs.select(
                (F.col("doc_id") + k * ID_STRIDE).alias("doc_id"),
                F.translate("text", src, dst).alias("text"),
                "lang", "source",
                "n_chars",  # translate is length-preserving
            )
        )
        mask = F.array(*[F.lit(s) for s in masks[k]])
        emb_parts.append(
            embs.select(
                (F.col("vec_id") + k * ID_STRIDE).alias("vec_id"),
                F.zip_with(
                    "embedding", mask, lambda x, s: (x * s).cast("float")
                ).alias("embedding"),
                "label",
            )
        )
    d = doc_parts[0]
    for p in doc_parts[1:]:
        d = d.unionByName(p)
    e = emb_parts[0]
    for p in emb_parts[1:]:
        e = e.unionByName(p)
    d.repartition(n_files).write.parquet(f"{out_dir}/documents.parquet")
    e.repartition(n_files).write.parquet(f"{out_dir}/embeddings.parquet")
