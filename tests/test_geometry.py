"""Octahedral geometry table tests: bijectivity, causality, weights."""

import numpy as np

from pyc2ray_tpu.ops.geometry import build_geometry, max_q_for


def test_full_box_covers_grid_exactly_once():
    """Full-box octahedron must enumerate each periodic cell exactly once."""
    N = 8
    g = build_geometry(N, max_q_for(1e9, N))
    C = g.num_cells
    assert C == N ** 3
    off = g.offsets[:, :C].astype(np.int64)
    lin = ((off[0] % N) * N + off[1] % N) * N + off[2] % N
    assert len(np.unique(lin)) == N ** 3


def test_shells_partition_and_ordering():
    N = 16
    g = build_geometry(N, max_q_for(1e9, N))
    C = g.num_cells
    q = np.abs(g.offsets[:, :C]).sum(axis=0)
    # cells sorted by shell
    assert np.all(np.diff(q) >= 0)
    # shell_start consistent
    for qq in range(g.max_q + 1):
        s, e = g.shell_start[qq], g.shell_start[qq + 1]
        assert np.all(q[s:e] == qq)
        assert e - s == g.shell_size[qq]


def test_corner_causality():
    """Corners with nonzero weight live in strictly earlier shells."""
    N = 12
    g = build_geometry(N, max_q_for(1e9, N))
    C = g.num_cells
    q = np.abs(g.offsets[:, :C]).sum(axis=0)
    for c in range(4):
        has_w = g.sw[c, :C] > 0
        nbr_q = q[g.nbr[c, :C][has_w]]
        assert np.all(nbr_q < q[has_w])


def test_weights_sum_to_one():
    """Geometric corner weights always sum to 1 (bilinear interpolation)."""
    N = 12
    g = build_geometry(N, max_q_for(1e9, N))
    C = g.num_cells
    ssum = g.sw[:, 1:C].sum(axis=0)
    np.testing.assert_allclose(ssum, 1.0, atol=1e-12)


def test_small_radius_octahedron():
    """q_max from R: sphere of radius R must fit inside the octahedron."""
    N = 32
    R = 5.0
    mq = max_q_for(R, N)
    assert mq == int(np.ceil(1.73205080757 * R))
    g = build_geometry(N, mq)
    C = g.num_cells
    q = np.abs(g.offsets[:, :C]).sum(axis=0)
    assert q.max() == mq
    # all cells within euclidean distance R are present
    expected = 0
    rng = np.arange(-mq, mq + 1)
    DI, DJ, DK = np.meshgrid(rng, rng, rng, indexing="ij")
    inside_sphere = DI**2 + DJ**2 + DK**2 <= R * R
    inside_octa = np.abs(DI) + np.abs(DJ) + np.abs(DK) <= mq
    assert np.all(inside_octa[inside_sphere])


def test_path_positive_and_bounded():
    N = 12
    g = build_geometry(N, max_q_for(1e9, N))
    C = g.num_cells
    assert g.path[0] == 0.5
    p = g.path[1:C]
    assert np.all(p >= 1.0) and np.all(p <= np.sqrt(3.0) + 1e-12)
