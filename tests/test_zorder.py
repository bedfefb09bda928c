"""Z-order layout keys (stages/zorder.py) — bit parity + locality."""

import numpy as np

from encode_ingest_ray.stages.zorder import morton2, part1by1


def _naive(x, y):
    z = 0
    for j in range(21):
        z |= ((x >> j) & 1) << (2 * j)
        z |= ((y >> j) & 1) << (2 * j + 1)
    return z


def test_morton_matches_naive_interleave():
    rng = np.random.RandomState(7)
    xs = rng.randint(0, 1 << 21, 500)
    ys = rng.randint(0, 1 << 21, 500)
    got = morton2(xs, ys)
    assert all(int(g) == _naive(int(a), int(b)) for g, a, b in zip(got, xs, ys))


def test_part1by1_boundaries():
    assert part1by1(np.array([0]))[0] == 0
    assert part1by1(np.array([1]))[0] == 1
    assert part1by1(np.array([0b11]))[0] == 0b101
    full = part1by1(np.array([(1 << 21) - 1]))[0]
    assert int(full) == int("01" * 21, 2)


def test_zorder_prefix_locality():
    # nearby (x, y) points share a z-prefix; far points don't
    a = morton2(np.array([100]), np.array([200]))[0]
    b = morton2(np.array([101]), np.array([201]))[0]
    c = morton2(np.array([100000]), np.array([500000]))[0]
    assert int(a) >> 10 == int(b) >> 10
    assert int(a) >> 30 != int(c) >> 30
