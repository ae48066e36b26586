"""CLI end-to-end: the reference `community` binary's workflow."""

import json
import os

import pytest

from parallel_louvain_method_ray.cli import main

REF_GRAPH_DIR = "/root/reference/data/graph"


@pytest.mark.skipif(
    not os.path.isdir(REF_GRAPH_DIR), reason="reference data not present"
)
def test_cli_one_level_reference_golden(tmp_path):
    out = str(tmp_path / "out")
    rc = main([REF_GRAPH_DIR, out, "--partitions", "4"])
    assert rc == 0
    with open(os.path.join(out, "metrics.json")) as f:
        m = json.load(f)
    assert m["n_vertices"] == 16 and m["m"] == 28
    assert m["modularity_before"] == pytest.approx(-0.0714286, abs=1e-6)
    assert m["modularity_after"] == pytest.approx(0.346301, abs=1e-6)
    assert m["n_communities"] == 4
    assert os.path.isdir(os.path.join(out, "communities"))
    assert os.path.isdir(os.path.join(out, "graph_txt"))
