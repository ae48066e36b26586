"""Degenerate inputs: empty graphs, self-loops, single vertices, weighted
multigraph entries, adversarial HTML."""

import numpy as np
import pyarrow as pa
import pytest
import ray.data

from parallel_louvain_method_ray.algos.components import connected_components
from parallel_louvain_method_ray.algos.louvain import louvain, modularity
from parallel_louvain_method_ray.algos.lpa import label_propagation
from parallel_louvain_method_ray.algos.pagerank import pagerank
from parallel_louvain_method_ray.algos.triangles import triangle_counts
from parallel_louvain_method_ray.config import EngineConfig
from parallel_louvain_method_ray.graph.build import graph_from_entry_arrays
from parallel_louvain_method_ray.web.extract import HtmlExtractor


def _g(src, dst, w=None, P=2, **kw):
    src = np.asarray(src, np.int64)
    dst = np.asarray(dst, np.int64)
    w = np.ones(len(src)) if w is None else np.asarray(w, np.float64)
    return graph_from_entry_arrays(src, dst, w, EngineConfig(num_partitions=P), **kw)


def test_self_loops_through_louvain():
    # self-loops excluded from gains/in, counted once in degree (reference
    # semantics); graph: triangle + a self loop on 0
    g = _g([0, 1, 2, 0], [1, 2, 0, 0], [1, 1, 1, 5])
    res = louvain(g)
    # the heavy self-loop inflates tot[comm(0)] (deg includes it once,
    # reference semantics), making 0's community unattractive — 1 and 2
    # merge, 0 stays alone; the point is: no crash, sane structure
    assert np.unique(res.assignments).shape[0] == 2
    assert res.assignments[1] == res.assignments[2]
    ranks, _ = pagerank(g, tol=1e-12)
    assert ranks.sum() == pytest.approx(1.0, abs=1e-9)


def test_single_edge_graph():
    g = _g([0], [1])
    res = louvain(g)
    assert res.assignments.shape[0] == 2
    labels, _ = connected_components(g)
    np.testing.assert_array_equal(labels, [0, 0])
    pv, total = triangle_counts(g)
    assert total == 0


def test_multigraph_duplicate_pair_different_weights():
    # (0,1,1.0) and (0,1,2.0) both survive the triple-dedup (reference
    # set<pair> semantics) -> degree of 0 is 3
    g = _g([0, 0, 1], [1, 1, 2], [1.0, 2.0, 1.0])
    assert g.degrees()[0] == pytest.approx(3.0)
    res = louvain(g)
    assert res.assignments.shape[0] == 3
    labels, _ = label_propagation(g)
    assert np.unique(labels).shape[0] >= 1


def test_isolated_vertices_via_n_vertices():
    # vertex 4 has no edges: singleton community, own CC label, rank from
    # dangling redistribution only
    g = _g([0, 1], [1, 2], P=2, n_vertices=5)
    res = louvain(g)
    assert res.assignments.shape[0] == 5
    labels, _ = connected_components(g)
    assert labels[3] == 3 and labels[4] == 4
    ranks, _ = pagerank(g, tol=1e-12)
    assert ranks.sum() == pytest.approx(1.0, abs=1e-9)
    assert ranks[4] < ranks[1]


def test_disconnected_equal_components_deterministic():
    g = _g([0, 2], [1, 3], P=2)
    r1 = louvain(g)
    g2 = _g([0, 2], [1, 3], P=2)
    r2 = louvain(g2)
    np.testing.assert_array_equal(r1.assignments, r2.assignments)


def test_extractor_adversarial_html():
    ex = HtmlExtractor()
    # unclosed tags, nested anchors, entities in href, broken script
    raw = (
        '<html><body><p>alpha <a href="/x?a=1&amp;b=2">link</a>'
        "<div>beta<br>gamma"
        "<script>while(1){'</'}</script>"
        "<p>tail &#8212; end"
    )
    text = ex.extract_text(raw)
    assert "alpha link" in text and "beta\ngamma" in text
    assert "while(1)" not in text
    assert "— end" in text  # numeric entity decoded
    links = ex.extract_links(raw, "https://h.example/p/1")
    assert links == ["https://h.example/x?a=1&b=2"]


def test_extractor_non_utf8_bytes():
    ex = HtmlExtractor()
    blob = b"<p>ok \xff\xfe broken</p>"
    text = ex.extract_text(blob.decode("utf-8", errors="replace"))
    assert "ok" in text and "broken" in text


def test_empty_documents_text_ops():
    from parallel_louvain_method_ray.dedup.exact import exact_dup_groups
    from parallel_louvain_method_ray.textops.analysis import text_stats

    docs = ray.data.from_arrow(
        pa.table(
            {
                "doc_id": np.array([0, 1], dtype=np.int64),
                "text": pa.array(["", "   "], pa.string()),
            }
        )
    )
    t = pa.concat_tables(
        [pa.table(b) for b in text_stats(docs).iter_batches(batch_format="pyarrow")]
    )
    assert t.to_pandas().n_tokens.tolist() == [0, 0]
    d = pa.concat_tables(
        [
            pa.table(b)
            for b in exact_dup_groups(docs).iter_batches(batch_format="pyarrow")
        ]
    )
    # both normalize to "" -> one group of 2
    assert d.num_rows == 1 and d.to_pandas().n_docs.iloc[0] == 2
