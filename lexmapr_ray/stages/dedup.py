"""Deduplication stages: exact, MinHash-LSH, SimHash, n-gram Jaccard.

Scale design:
 - Exact dedup hash-partitions on a content digest (the groupby key is the
   md5, so identical documents co-locate) with a per-batch combiner first.
 - MinHash-LSH is the shuffle-frugal near-dup path: per-batch
   shingle->minhash (numpy-vectorized), explode to (band, band_hash) keys,
   ONE groupby over the band keys, candidate pairs verified with exact
   Jaccard inside the group reducer.  No pairwise all-to-all.
 - SimHash emits one 64-bit signature per doc; near-dup candidates are
   bucketed by signature bands the same way.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

# Deterministic MinHash parameters
NUM_HASHES = 64
NUM_BANDS = 16  # 16 bands x 4 rows
ROWS_PER_BAND = NUM_HASHES // NUM_BANDS
_MERSENNE = (1 << 61) - 1
_RNG = np.random.RandomState(1234567)
_HASH_A = _RNG.randint(1, _MERSENNE, size=NUM_HASHES, dtype=np.int64).astype(np.uint64)
_HASH_B = _RNG.randint(0, _MERSENNE, size=NUM_HASHES, dtype=np.int64).astype(np.uint64)



def _auto_concurrency(requested=None) -> int:
    """Actor-pool size that can never starve upstream tasks: a pool equal to
    the CPU count deadlocks the streaming executor on small clusters (the
    read/sort tasks have no slot to run in), so cap at CPUs - 2."""
    import ray

    cpus = int(ray.cluster_resources().get("CPU", 4)) if ray.is_initialized() else 4
    cap = max(1, cpus - 2)
    return min(requested, cap) if requested else cap


def _read_documents(sf_dir: str, columns=None):
    import ray.data as rd

    return rd.read_parquet(f"{sf_dir}/documents.parquet", columns=columns)


def _shingles(text: str, k: int = 3) -> set[int]:
    """Word k-shingles hashed to stable 64-bit ints."""
    toks = text.split()
    if len(toks) < k:
        grams = [" ".join(toks)] if toks else []
    else:
        grams = [" ".join(toks[i:i + k]) for i in range(len(toks) - k + 1)]
    out = set()
    for g in grams:
        h = int.from_bytes(hashlib.blake2b(g.encode(), digest_size=8).digest(), "big")
        out.add(h)
    return out


def _minhash_signature(shingles: set[int]) -> np.ndarray:
    if not shingles:
        return np.full(NUM_HASHES, np.iinfo(np.uint64).max, dtype=np.uint64)
    vals = np.fromiter(shingles, dtype=np.uint64, count=len(shingles))
    # (a*x + b) mod p, vectorized over (hashes x shingles)
    prod = (_HASH_A[:, None] * vals[None, :] + _HASH_B[:, None]) % np.uint64(_MERSENNE)
    return prod.min(axis=1)


# ---------------------------------------------------------------------------
# Exact dedup
# ---------------------------------------------------------------------------

def dedup_exact(sf_dir: str):
    """One surviving doc_id (the minimum) per distinct text.

    Key = content digest -> the groupby shuffles one small row per doc and
    co-locates duplicates; the reducer keeps min(doc_id).
    """
    ds = _read_documents(sf_dir, ["doc_id", "text"])

    def digest(t: pa.Table) -> pa.Table:
        texts = t["text"].to_pylist()
        return pa.table({
            "doc_id": t["doc_id"],
            "text": t["text"],
            "digest": pa.array(
                [hashlib.md5(s.encode()).hexdigest() for s in texts], pa.string()
            ),
        })

    # per-key min is associative: the same vectorized reduce serves as the
    # pre-shuffle combiner (keeping digest) and the post-sort final (see
    # lexmapr_ray.functions.groupagg for why groupby().map_groups is banned)
    def keep_min_partial(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values(["digest", "doc_id"], kind="mergesort")
        return df.drop_duplicates("digest", keep="first")

    def keep_min_final(df: pd.DataFrame) -> pd.DataFrame:
        return keep_min_partial(df)[["doc_id", "text"]]

    from lexmapr_ray.functions.groupagg import sorted_group_reduce

    return sorted_group_reduce(
        ds.map_batches(digest, batch_format="pyarrow"),
        "digest", keep_min_partial, keep_min_final,
    ).sort("doc_id")


# ---------------------------------------------------------------------------
# MinHash + LSH near-dup
# ---------------------------------------------------------------------------

class MinHasher:
    """Actor-pool stage: text -> (doc_id, band, band_hash) rows."""

    def __call__(self, t: pa.Table) -> pa.Table:
        doc_ids, bands, band_hashes = [], [], []
        for doc_id, text in zip(t["doc_id"].to_pylist(), t["text"].to_pylist()):
            sig = _minhash_signature(_shingles(text))
            for b in range(NUM_BANDS):
                chunk = sig[b * ROWS_PER_BAND:(b + 1) * ROWS_PER_BAND]
                bh = int.from_bytes(
                    hashlib.blake2b(chunk.tobytes(), digest_size=8).digest(), "big"
                ) >> 1  # fit int64
                doc_ids.append(doc_id)
                bands.append(b)
                band_hashes.append(bh)
        return pa.table({
            "doc_id": pa.array(doc_ids, pa.int64()),
            "band": pa.array(bands, pa.int32()),
            "band_hash": pa.array(band_hashes, pa.int64()),
        })


def minhash_candidate_pairs(sf_dir: str, concurrency: int | None = None):
    """LSH bucket groupby -> unverified candidate pairs (doc_a < doc_b)."""
    ds = _read_documents(sf_dir, ["doc_id", "text"])
    banded = ds.map_batches(MinHasher, batch_format="pyarrow", concurrency=_auto_concurrency(concurrency))

    # pair generation: sort co-locates each LSH bucket in one block, then a
    # vectorized self-merge within the block emits candidate pairs (a<b)
    def pairs_block(df: pd.DataFrame) -> pd.DataFrame:
        if len(df) == 0:
            return pd.DataFrame({"doc_a": pd.Series([], dtype="int64"),
                                 "doc_b": pd.Series([], dtype="int64")})
        m = df.merge(df, on=["band", "band_hash"])
        m = m[m["doc_id_x"] < m["doc_id_y"]]
        out = m.rename(columns={"doc_id_x": "doc_a", "doc_id_y": "doc_b"})
        return out[["doc_a", "doc_b"]].drop_duplicates()

    cand = banded.sort(["band", "band_hash"]).map_batches(
        pairs_block, batch_format="pandas", batch_size=None
    )
    # distinct pairs (a pair can surface from several bands/blocks)
    return cand.sort(["doc_a", "doc_b"]).map_batches(
        lambda df: df.drop_duplicates(), batch_format="pandas", batch_size=None
    )


def minhash_dedup_pairs(sf_dir: str, threshold: float = 0.8, concurrency: int | None = None):
    """Verified near-dup pairs: LSH candidates + exact Jaccard >= threshold.

    Verification broadcasts nothing: the texts for the (small) candidate set
    are fetched via a broadcast id->text map built from the candidate ids
    only.  At web scale this becomes a join of candidates back to the corpus;
    here candidate cardinality << corpus so the broadcast side stays small.
    """
    import ray

    cand = minhash_candidate_pairs(sf_dir, concurrency=_auto_concurrency(concurrency)).to_pandas()
    if cand.empty:
        import ray.data as rd

        return rd.from_pandas(pd.DataFrame(
            {"doc_a": pd.Series([], dtype="int64"),
             "doc_b": pd.Series([], dtype="int64"),
             "jaccard_pct": pd.Series([], dtype="int64")}))

    # broadcast semi-join: the candidate id set is shipped once; the corpus
    # is filtered DISTRIBUTED and only the (small) candidate texts return to
    # the driver — never iterate the full corpus driver-side
    needed = set(cand["doc_a"]) | set(cand["doc_b"])
    needed_ref = ray.put(needed)

    def pick(t: pa.Table) -> pa.Table:
        keep = pc.is_in(
            t["doc_id"], value_set=pa.array(list(ray.get(needed_ref)), pa.int64())
        )
        return t.filter(keep)

    docs = _read_documents(sf_dir, ["doc_id", "text"]).map_batches(
        pick, batch_format="pyarrow"
    )
    picked = docs.to_pandas()
    id_text = dict(zip(picked["doc_id"], picked["text"]))
    texts_ref = ray.put(id_text)

    import ray.data as rd

    cand_ds = rd.from_pandas(cand)

    def verify(t: pa.Table) -> pa.Table:
        lookup = ray.get(texts_ref)
        out_a, out_b, out_j = [], [], []
        for a, b in zip(t["doc_a"].to_pylist(), t["doc_b"].to_pylist()):
            sa, sb = _shingles(lookup[a]), _shingles(lookup[b])
            union = len(sa | sb)
            j = (len(sa & sb) / union) if union else 1.0
            if j >= threshold:
                out_a.append(a)
                out_b.append(b)
                out_j.append(int(round(j * 100)))
        return pa.table({
            "doc_a": pa.array(out_a, pa.int64()),
            "doc_b": pa.array(out_b, pa.int64()),
            "jaccard_pct": pa.array(out_j, pa.int64()),
        })

    return cand_ds.map_batches(verify, batch_format="pyarrow").sort(["doc_a", "doc_b"])


# ---------------------------------------------------------------------------
# SimHash
# ---------------------------------------------------------------------------

def simhash_signatures(sf_dir: str):
    """64-bit SimHash per document (token-feature voting)."""
    ds = _read_documents(sf_dir, ["doc_id", "text"])

    def sim(t: pa.Table) -> pa.Table:
        texts = t["text"].to_pylist()
        doc_tokens = [s.split() for s in texts]
        # hash each DISTINCT token once per batch, expand to a +-1 bit-vote
        # matrix, then one reduceat sums votes per document — no per-token
        # Python in the hot path
        vocab: dict[str, int] = {}
        for toks in doc_tokens:
            for tok in toks:
                if tok not in vocab:
                    vocab[tok] = len(vocab)
        shifts = np.arange(64, dtype=np.uint64)
        if vocab:
            hashes = np.fromiter(
                (int.from_bytes(hashlib.blake2b(tok.encode(), digest_size=8).digest(), "big")
                 for tok in vocab),
                dtype=np.uint64, count=len(vocab),
            )
            votes_per_token = np.where(
                ((hashes[:, None] >> shifts) & np.uint64(1)) == 1, 1, -1
            ).astype(np.int32)
        else:
            votes_per_token = np.zeros((0, 64), dtype=np.int32)

        idx = np.fromiter(
            (vocab[tok] for toks in doc_tokens for tok in toks),
            dtype=np.int64,
        )
        lengths = np.array([len(toks) for toks in doc_tokens], dtype=np.int64)
        offsets = np.concatenate(([0], np.cumsum(lengths)[:-1]))
        expanded = votes_per_token[idx] if len(idx) else np.zeros((0, 64), np.int32)
        votes = np.zeros((len(texts), 64), dtype=np.int64)
        nonempty = lengths > 0
        if expanded.shape[0]:
            sums = np.add.reduceat(expanded, offsets[nonempty], axis=0)
            votes[nonempty] = sums
        bits = (votes > 0).astype(np.uint64)
        sig = (bits << shifts).sum(axis=1, dtype=np.uint64)
        # same signed mapping as a scalar `sig - 2**63`: wraparound + view
        signed = np.subtract(sig, np.uint64(1 << 63)).view(np.int64)
        return pa.table({"doc_id": t["doc_id"], "simhash": pa.array(signed, pa.int64())})

    return ds.map_batches(sim, batch_format="pyarrow").sort("doc_id")


def ngram_jaccard_pairs(sf_dir: str, threshold: float = 0.5, concurrency: int | None = None):
    """N-gram Jaccard near-dup with a lower threshold (wider LSH recall)."""
    return minhash_dedup_pairs(sf_dir, threshold=threshold, concurrency=_auto_concurrency(concurrency))
