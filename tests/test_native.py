"""Native C++ component tests: clique parity with the reference's gtest cases,
Hamming k-NN vs numpy oracle, toposort."""

import numpy as np
import pytest

from tod_tpu.native import Graph, hamming_knn_cpu, toposort


def test_clique_reference_graph1():
    """Same 10-vertex graph as the reference's OR_tod.Graph1 gtest
    (test/test_maximum_clique.cpp:7-38): max clique size 4."""
    g = Graph(10)
    for u, v in [(4, 1), (4, 3), (5, 3), (6, 1), (6, 4), (7, 0), (7, 2),
                 (7, 3), (7, 4), (7, 5), (8, 0), (8, 2), (8, 3), (8, 5),
                 (8, 6), (9, 0), (9, 1), (9, 2), (9, 3), (9, 4), (9, 6),
                 (9, 7), (9, 8)]:
        g.add_edge(u, v)
    clique = g.find_maximum_clique()
    assert len(clique) == 4
    # verify it actually is a clique
    for i in clique:
        for j in clique:
            if i != j:
                assert (min(i, j), max(i, j)) in g._edges


def test_clique_reference_graph2():
    """K10 minus one edge => max clique 9 (test_maximum_clique.cpp:40-53)."""
    g = Graph(10)
    for i in range(10):
        for j in range(i + 1, 10):
            g.add_edge(i, j)
    g.delete_edge(0, 1)
    assert len(g.find_maximum_clique()) == 9


def test_clique_early_exit_minimal_size():
    g = Graph(20)
    for i in range(12):
        for j in range(i + 1, 12):
            g.add_edge(i, j)  # K12
    c = g.find_clique(minimal_size=5)
    assert len(c) >= 5  # early exit at >= minimal


def test_clique_random_vs_bruteforce(rng):
    import itertools
    for trial in range(5):
        n = 12
        p = 0.5
        adj = rng.random((n, n)) < p
        adj = np.triu(adj, 1)
        g = Graph(n)
        for u, v in zip(*np.nonzero(adj)):
            g.add_edge(int(u), int(v))
        sym = adj | adj.T
        best = 0
        for size in range(n, 0, -1):
            found = False
            for comb in itertools.combinations(range(n), size):
                if all(sym[a, b] for a, b in itertools.combinations(comb, 2)):
                    found = True
                    break
            if found:
                best = size
                break
        assert len(g.find_maximum_clique()) == best


def test_clique_empty_graph():
    g = Graph(5)
    assert g.find_maximum_clique() in ([], [0], [1], [2], [3], [4])


def test_dimacs_roundtrip(tmp_path):
    path = tmp_path / "k4.clq"
    path.write_text("c tiny complete graph\np edge 4 6\n"
                    "e 1 2 \ne 1 3 \ne 1 4 \ne 2 3 \ne 2 4 \ne 3 4 \n")
    g = Graph.from_dimacs(str(path))
    assert g.n == 4
    assert len(g.find_maximum_clique()) == 4


def test_hamming_knn_cpu_matches_numpy(rng):
    q = rng.integers(0, 256, (40, 32), dtype=np.uint8)
    db = rng.integers(0, 256, (500, 32), dtype=np.uint8)
    idx, dist = hamming_knn_cpu(q, db, k=5)
    ref = (np.unpackbits(q, axis=1)[:, None, :]
           != np.unpackbits(db, axis=1)[None, :, :]).sum(-1)
    ref_sorted = np.sort(ref, axis=1)[:, :5]
    np.testing.assert_array_equal(dist, ref_sorted)
    for i in range(40):
        np.testing.assert_array_equal(ref[i, idx[i]], dist[i])


def test_toposort_orders_and_detects_cycles():
    order = toposort(4, [(0, 1), (1, 2), (0, 3), (3, 2)])
    pos = {v: i for i, v in enumerate(order)}
    for u, v in [(0, 1), (1, 2), (0, 3), (3, 2)]:
        assert pos[u] < pos[v]
    with pytest.raises(ValueError):
        toposort(3, [(0, 1), (1, 2), (2, 0)])


def test_compress_model_dedup(rng):
    from tod_tpu.ops.compress import compress_model

    base_desc = rng.integers(0, 256, (50, 32), dtype=np.uint8)
    base_pts = rng.uniform(-0.1, 0.1, (50, 3)).astype(np.float32)
    # duplicates: tiny descriptor + point perturbations of the first 30
    flip = np.zeros((30, 32), np.uint8)
    flip[:, 0] = 3  # 2 bit flips
    dup_desc = base_desc[:30] ^ flip
    dup_pts = base_pts[:30] + 0.001
    desc = np.concatenate([base_desc, dup_desc])
    pts = np.concatenate([base_pts, dup_pts])

    out_desc, out_pts = compress_model(desc, pts, hamming_threshold=8,
                                       point_threshold=0.01)
    assert len(out_desc) == 50  # all duplicates removed, originals kept
    np.testing.assert_array_equal(out_desc, base_desc)

    # same appearance at a DIFFERENT place must survive
    far_pts = base_pts[:10] + 0.5
    desc2 = np.concatenate([base_desc, base_desc[:10]])
    pts2 = np.concatenate([base_pts, far_pts])
    out_desc2, _ = compress_model(desc2, pts2)
    assert len(out_desc2) == 60
