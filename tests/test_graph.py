"""Element-for-element parity of dsgcn_tpu.graph vs the reference Graph."""
import numpy as np
import pytest

from dsgcn_tpu.graph import Graph, k_adjacency

import ref_loader


@pytest.fixture(scope="module")
def refgraph():
    return ref_loader.load_ref_graph()


@pytest.mark.parametrize("layout", ["nturgb+d", "coco", "openpose"])
@pytest.mark.parametrize("mode", ["spatial", "stgcn_spatial", "binary_adj"])
def test_adjacency_parity(refgraph, layout, mode):
    ours = Graph(layout=layout, mode=mode)
    ref = refgraph.Graph(layout=layout, mode=mode)
    np.testing.assert_allclose(ours.A, ref.A, atol=0, rtol=0)


@pytest.mark.parametrize("layout", ["nturgb+d", "coco"])
def test_semantic_types_parity(refgraph, layout):
    ours = Graph(layout=layout, mode="spatial")
    ref = refgraph.Graph(layout=layout, mode="spatial")
    assert ours.node_type == list(ref.node_type)
    np.testing.assert_array_equal(ours.edge_type, ref.edge_type)
    # 15 distinct classes for 5 body parts
    assert len(np.unique(ours.edge_type)) == 15


def test_random_mode_shape_and_stats():
    g = Graph(layout="nturgb+d", mode="random", num_filter=3, init_std=0.02,
              init_off=0.04, seed=0)
    assert g.A.shape == (3, 25, 25)
    assert abs(g.A.mean() - 0.04) < 5e-3
    assert abs(g.A.std() - 0.02) < 5e-3


def test_random_mode_seeded_deterministic():
    a = Graph(layout="nturgb+d", mode="random", seed=7).A
    b = Graph(layout="nturgb+d", mode="random", seed=7).A
    np.testing.assert_array_equal(a, b)


def test_k_adjacency_parity(refgraph):
    g = Graph(layout="nturgb+d", mode="binary_adj")
    A = g.A[0]
    for k in range(4):
        ours = k_adjacency(A, k, with_self=True)
        ref = refgraph.k_adjacency(A, k, with_self=True)
        np.testing.assert_allclose(ours, ref)


def test_stgcn_spatial_structure():
    g = Graph(layout="nturgb+d", mode="stgcn_spatial")
    # max_hop=1 -> K = 3 subsets (hop0 close, hop1 close, hop1 further)
    assert g.A.shape == (3, 25, 25)
    # each column of the summed partition equals the normalized adjacency column sums
    assert (g.A.sum(0) >= 0).all()
