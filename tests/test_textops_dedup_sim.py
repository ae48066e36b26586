"""Text analysis, dedup family, similarity search, multimodal plumbing."""

import numpy as np
import pyarrow as pa
import pytest
import ray.data

from parallel_louvain_method_ray.dedup.embedding import embedding_near_dups
from parallel_louvain_method_ray.dedup.exact import exact_dup_groups
from parallel_louvain_method_ray.dedup.jaccard import shingle_jaccard_pairs
from parallel_louvain_method_ray.dedup.minhash import (
    near_dup_pairs_minhash,
    minhash_signatures,
)
from parallel_louvain_method_ray.dedup.simhash import near_dup_pairs_simhash
from parallel_louvain_method_ray.mm.media import (
    decode_features,
    sample_frames,
    synthesize_media,
    MediaDecoder,
)
from parallel_louvain_method_ray.sim.search import (
    cosine_topk,
    cosine_topk_lsh,
)
from parallel_louvain_method_ray.textops.analysis import (
    LangId,
    fingerprints,
    text_stats,
    top_tokens,
)


def _docs(texts):
    return ray.data.from_arrow(
        pa.table(
            {
                "doc_id": np.arange(len(texts), dtype=np.int64),
                "text": pa.array(texts, pa.string()),
            }
        )
    )


def _collect(ds):
    if isinstance(ds, pa.Table):
        return ds
    return pa.concat_tables(
        [pa.table(b) for b in ds.iter_batches(batch_format="pyarrow")]
    )


def test_text_stats():
    t = _collect(text_stats(_docs(["a b  c!", "", "one, two; three?"])))
    df = t.to_pandas().set_index("doc_id").sort_index()
    assert df.loc[0, "n_tokens"] == 3 and df.loc[0, "n_punct"] == 1
    assert df.loc[1, "n_tokens"] == 0 and df.loc[1, "n_chars"] == 0
    assert df.loc[2, "n_tokens"] == 3 and df.loc[2, "n_punct"] == 3


def test_fingerprints_normalization():
    t = _collect(fingerprints(_docs(["Hello  World", "hello world", "other"])))
    fps = t.to_pandas().set_index("doc_id")["fp"]
    assert fps[0] == fps[1] != fps[2]


def test_top_tokens_deterministic():
    t = top_tokens(_docs(["a a b", "b c a", "c b a"]), k=2)
    assert t.column("token").to_pylist() == ["a", "b"]
    assert t.column("n").to_pylist() == [4, 3]


def test_lang_id_heuristic():
    lid = LangId()
    assert lid.classify("the cat and the dog is in a house") == "en"
    assert lid.classify("der Hund und die Katze ist nicht ein Tier") == "de"
    assert lid.classify("le chat est un animal et les chiens") == "fr"
    assert lid.classify("xyzzy plugh") == "und"


def test_exact_dedup():
    t = _collect(
        exact_dup_groups(_docs(["same text", "Same  TEXT", "unique"]))
    )
    df = t.to_pandas().sort_values("keeper_doc_id", ignore_index=True)
    assert len(df) == 2
    assert df.loc[0, "keeper_doc_id"] == 0 and df.loc[0, "n_docs"] == 2
    assert df.loc[1, "keeper_doc_id"] == 2 and df.loc[1, "n_docs"] == 1


_BASE = (
    "spark ray data engine shuffle partition block stream actor pool "
    "arrow batch vector column row group scan filter join sort window"
)


def test_minhash_near_dups_planted():
    texts = []
    for i in range(20):
        texts.append(f"doc {i} " + _BASE + f" tail {i} " + _BASE)
    # doc 20 = near-dup of doc 3 (one word changed)
    texts.append(texts[3].replace("window", "frame"))
    pairs = near_dup_pairs_minhash(_docs(texts), threshold=0.5)
    df = pairs.to_pandas()
    assert ((df.doc_a == 3) & (df.doc_b == 20)).any()
    got = df[(df.doc_a == 3) & (df.doc_b == 20)].jaccard.iloc[0]
    assert 0.5 <= got < 1.0


def test_simhash_near_dups_planted():
    texts = [f"doc number {i} " + _BASE + f" {i}" for i in range(15)]
    texts.append(texts[2])  # identical copy -> hamming 0
    pairs = near_dup_pairs_simhash(_docs(texts), max_hamming=3)
    df = pairs.to_pandas()
    assert ((df.doc_a == 2) & (df.doc_b == 15) & (df.hamming == 0)).any()


def test_jaccard_exact_value():
    # doc0: shingles {a b c, b c d}; doc1: {a b c, b c e} -> jaccard = 1/3
    t = shingle_jaccard_pairs(_docs(["a b c d", "a b c e"]), threshold=0.1)
    df = t.to_pandas()
    assert len(df) == 1
    assert df.jaccard.iloc[0] == pytest.approx(1 / 3, abs=1e-6)


def _emb_ds(mat, ids=None):
    ids = np.arange(mat.shape[0], dtype=np.int64) if ids is None else ids
    return ray.data.from_arrow(
        pa.table(
            {
                "vec_id": ids,
                "embedding": pa.array(
                    [r.astype(np.float32).tolist() for r in mat],
                    pa.list_(pa.float32()),
                ),
            }
        )
    )


def test_embedding_near_dups_planted():
    rng = np.random.default_rng(3)
    mat = rng.standard_normal((50, 16))
    mat[20] = mat[4] + 0.001  # near-identical pair
    t = embedding_near_dups(_emb_ds(mat), threshold=0.99)
    df = t.to_pandas()
    assert ((df.vec_a == 4) & (df.vec_b == 20)).any()


def test_cosine_topk_matches_numpy_oracle():
    rng = np.random.default_rng(11)
    mat = rng.standard_normal((200, 32))
    ds = _emb_ds(mat)
    qids = np.array([0, 5], dtype=np.int64)
    res = cosine_topk(ds, mat[qids], qids, k=5).to_pandas()

    unit = mat / np.linalg.norm(mat, axis=1)[:, None]
    for q in qids:
        sims = unit @ unit[q]
        sims[q] = -np.inf
        expect = set(np.argsort(-sims)[:5].tolist())
        got = set(res[res.query_id == q].vec_id.tolist())
        assert got == expect


def test_cosine_topk_lsh_recall():
    rng = np.random.default_rng(23)
    mat = rng.standard_normal((300, 32))
    # plant tight cluster around query 7
    for j in range(290, 300):
        mat[j] = mat[7] + 0.01 * rng.standard_normal(32)
    ds = _emb_ds(mat)
    qids = np.array([7], dtype=np.int64)
    exact = set(
        cosine_topk(ds, mat[qids], qids, k=5).to_pandas().vec_id.tolist()
    )
    approx = set(
        cosine_topk_lsh(ds, mat[qids], qids, k=5).to_pandas().vec_id.tolist()
    )
    assert len(exact & approx) >= 4  # >= 80% recall on the planted cluster


def test_cosine_topk_ivf_recall_and_bucketed_layout():
    from parallel_louvain_method_ray.sim.search import (
        cosine_topk_ivf,
        ivf_assign,
        train_coarse_quantizer,
    )

    rng = np.random.default_rng(31)
    mat = rng.standard_normal((300, 32))
    for j in range(290, 300):  # tight cluster around query 7
        mat[j] = mat[7] + 0.01 * rng.standard_normal(32)
    ds = _emb_ds(mat)
    qids = np.array([7], dtype=np.int64)
    exact = set(
        cosine_topk(ds, mat[qids], qids, k=5).to_pandas().vec_id.tolist()
    )
    cent = train_coarse_quantizer(ds, n_centroids=16, sample_size=300)
    approx = set(
        cosine_topk_ivf(ds, mat[qids], qids, k=5, nprobe=4, centroids=cent)
        .to_pandas()
        .vec_id.tolist()
    )
    assert len(exact & approx) >= 4  # >= 80% recall on the planted cluster

    # build step: every vector gets a bucket in [0, n_centroids) — the
    # partition key for the write_parquet(partition_cols=["bucket"]) layout
    tagged = ivf_assign(ds, cent).to_pandas()
    assert len(tagged) == 300
    assert tagged.bucket.between(0, 15).all()
    # nprobe = all centroids degenerates to the exact scan
    full = set(
        cosine_topk_ivf(ds, mat[qids], qids, k=5, nprobe=16, centroids=cent)
        .to_pandas()
        .vec_id.tolist()
    )
    assert full == exact


def test_cosine_topk_ivf_batch_composition_independent():
    """ADVICE r3: a query's IVF result must not depend on which other
    queries it is batched with (candidates = its OWN nprobe buckets,
    never the union)."""
    from parallel_louvain_method_ray.sim.search import (
        cosine_topk_ivf,
        train_coarse_quantizer,
    )

    rng = np.random.default_rng(47)
    mat = rng.standard_normal((400, 32))
    ds = _emb_ds(mat)
    cent = train_coarse_quantizer(ds, n_centroids=16, sample_size=400)

    solo = cosine_topk_ivf(
        ds, mat[[7]], np.array([7], np.int64), k=5, nprobe=2, centroids=cent
    ).to_pandas()
    # batch query 7 with 5 far-apart queries (union of probed buckets is
    # much larger than query 7's own 2)
    qids = np.array([7, 50, 111, 222, 333, 390], dtype=np.int64)
    batched = cosine_topk_ivf(
        ds, mat[qids], qids, k=5, nprobe=2, centroids=cent
    ).to_pandas()
    b7 = batched[batched.query_id == 7].reset_index(drop=True)
    assert b7.vec_id.tolist() == solo.vec_id.tolist()
    assert np.allclose(b7.score.to_numpy(), solo.score.to_numpy())


def test_media_plumbing():
    ids = ray.data.from_arrow(
        pa.table({"doc_id": np.arange(40, dtype=np.int64)})
    )
    media = synthesize_media(ids)
    feats = _collect(decode_features(media, concurrency=2, batch_size=16))
    assert feats.num_rows == 40
    f0 = feats.to_pandas().set_index("media_id").loc[0]
    # deterministic: re-decode matches
    feats2 = _collect(decode_features(synthesize_media(ids)))
    assert feats.to_pandas().sort_values("media_id").feature.iloc[0] == pytest.approx(
        feats2.to_pandas().sort_values("media_id").feature.iloc[0]
    )
    frames = _collect(sample_frames(media, every_k=4)).to_pandas()
    kinds = _collect(media).to_pandas()
    n_videos = (kinds.kind == "video").sum()
    assert n_videos > 0
    assert set(frames.media_id) == set(kinds[kinds.kind == "video"].media_id)


def test_media_real_mode_decodes():
    # real mode no longer raises (round 3): it dispatches on payload magic
    # and runs the stdlib PNG/WAV/RVID codecs — full coverage in
    # tests/test_media_codecs.py
    from parallel_louvain_method_ray.mm.codecs import png_encode
    import numpy as np

    dec = MediaDecoder(fake=False)
    img = np.arange(64, dtype=np.uint8).reshape(8, 8)
    w, h, frames, feat = dec._decode_real(png_encode(img))
    assert (w, h, frames) == (8, 8, 1)
    assert abs(float(feat.sum()) - 1.0) < 1e-6
