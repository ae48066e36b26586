"""Golden-parity tests ported from /root/reference/tests/main_test.cpp."""

import numpy as np
import pytest

from parallel_louvain_method_ray.algos.louvain_seq import (
    SequentialCSR,
    SequentialLouvain,
    louvain_reference,
)
from tests.fixtures import (
    CSR5_EDGES,
    CSR5_GOLDEN_COLUMN_INDEX,
    CSR5_GOLDEN_ECOUNT,
    CSR5_GOLDEN_ROW_INDEX,
    LOUVAIN16_EDGES,
    LOUVAIN16_FINAL_MODULARITY,
    LOUVAIN16_INITIAL_MODULARITY,
    LOUVAIN16_N_COMMUNITIES,
    edges_xyz,
)


def test_csr_golden_arrays():
    # main_test.cpp:18-31
    src, dst, w = edges_xyz(CSR5_EDGES)
    csr = SequentialCSR(src, dst, w)
    assert csr.indptr.tolist() == CSR5_GOLDEN_ROW_INDEX
    assert csr.cols.tolist() == CSR5_GOLDEN_COLUMN_INDEX
    assert csr.weights.tolist() == [1.0] * 10
    assert csr.m == CSR5_GOLDEN_ECOUNT


def test_louvain16_golden_modularity():
    # main_test.cpp:61-82
    src, dst, w = edges_xyz(LOUVAIN16_EDGES)
    csr = SequentialCSR(src, dst, w)
    lv = SequentialLouvain(csr, tie_break="reference")
    assert lv.modularity() == pytest.approx(LOUVAIN16_INITIAL_MODULARITY, abs=1e-6)
    improved = lv.iterate()
    assert improved
    assert lv.modularity() == pytest.approx(LOUVAIN16_FINAL_MODULARITY, abs=1e-6)
    coarse, dense = lv.coarsen()
    assert np.unique(dense).shape[0] == LOUVAIN16_N_COMMUNITIES
    assert coarse.n == LOUVAIN16_N_COMMUNITIES


def test_louvain16_canonical_tiebreak_same_modularity():
    # canonical tie-break must land on the same converged modularity here
    src, dst, w = edges_xyz(LOUVAIN16_EDGES)
    lv = SequentialLouvain(SequentialCSR(src, dst, w), tie_break="canonical")
    lv.iterate()
    assert lv.modularity() == pytest.approx(LOUVAIN16_FINAL_MODULARITY, abs=1e-6)


def test_multilevel_reference_runs():
    src, dst, w = edges_xyz(LOUVAIN16_EDGES)
    membership, q, levels = louvain_reference(src, dst, w)
    assert q >= LOUVAIN16_FINAL_MODULARITY - 1e-9
    assert levels[0]["modularity_after"] == pytest.approx(
        LOUVAIN16_FINAL_MODULARITY, abs=1e-6
    )
    assert membership.shape[0] == 16
