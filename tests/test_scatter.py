import jax.numpy as jnp
import numpy as np
import pytest

from simultaneous_diffusion_for_pointclouds_tpu.ops import zbuffer_stats


def _numpy_oracle(keys, value, payload, valid, num_segments):
    sum_v = np.zeros(num_segments)
    sum_p = np.zeros(num_segments)
    count = np.zeros(num_segments)
    min_v = np.zeros(num_segments)
    min_p = np.zeros(num_segments)
    best = np.full(num_segments, np.inf)
    for k, v, p, ok in zip(keys, value, payload, valid):
        k = int(k) if ok else num_segments - 1
        if not ok:
            continue
        sum_v[k] += v
        sum_p[k] += p
        count[k] += 1
        if v < best[k]:
            best[k] = v
            min_v[k] = v
            min_p[k] = p
    return sum_v, sum_p, count, min_v, min_p


def test_zbuffer_stats_matches_oracle():
    rng = np.random.default_rng(0)
    n, segs = 5000, 64
    keys = rng.integers(0, segs - 1, n).astype(np.int32)
    value = rng.uniform(0, 10, n).astype(np.float32)
    payload = rng.normal(size=n).astype(np.float32)
    valid = rng.uniform(size=n) > 0.3

    stats = zbuffer_stats(keys, value, payload, valid, segs)
    sum_v, sum_p, count, min_v, min_p = _numpy_oracle(keys, value, payload, valid, segs)

    live = slice(0, segs - 1)  # last segment is the trash bin
    np.testing.assert_allclose(np.asarray(stats.sum_value)[live], sum_v[live], rtol=1e-4)
    np.testing.assert_allclose(np.asarray(stats.sum_payload)[live], sum_p[live], rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(np.asarray(stats.count)[live], count[live])
    np.testing.assert_allclose(np.asarray(stats.min_value)[live], min_v[live], rtol=1e-6)
    np.testing.assert_allclose(np.asarray(stats.min_payload)[live], min_p[live], rtol=1e-5, atol=1e-5)


def test_zbuffer_empty_segments_are_zero():
    keys = np.array([3, 3], dtype=np.int32)
    value = np.array([1.0, 2.0], dtype=np.float32)
    payload = np.array([5.0, 7.0], dtype=np.float32)
    valid = np.array([True, True])
    stats = zbuffer_stats(keys, value, payload, valid, 8)
    assert float(stats.count[0]) == 0.0
    assert float(stats.min_value[0]) == 0.0
    assert float(stats.min_payload[0]) == 0.0
    assert float(stats.min_value[3]) == 1.0
    assert float(stats.min_payload[3]) == 5.0
    assert float(stats.sum_value[3]) == 3.0


def test_sorted_zbuffer_matches_segment_ops_fuzz():
    from simultaneous_diffusion_for_pointclouds_tpu.ops.scatter import (
        zbuffer_stats_sorted,
        zbuffer_stats_sorted_v3,
        zbuffer_stats_sorted_v4,
    )

    for impl in (zbuffer_stats_sorted, zbuffer_stats_sorted_v3, zbuffer_stats_sorted_v4):
        for seed in range(3):
            rng = np.random.default_rng(seed)
            n, segs = 4000, 97
            keys = rng.integers(0, segs - 1, n).astype(np.int32)
            value = rng.uniform(0, 10, n).astype(np.float32)
            payload = rng.normal(size=n).astype(np.float32)
            valid = rng.uniform(size=n) > 0.4

            a = zbuffer_stats(keys, value, payload, valid, segs)
            b = impl(keys, value, payload, valid, segs)
            live = slice(0, segs - 1)
            for name in a._fields:
                x = np.asarray(getattr(a, name))[live]
                y = np.asarray(getattr(b, name))[live]
                np.testing.assert_allclose(
                    x, y, rtol=1e-5, atol=1e-4, err_msg=f"{impl.__name__} {name}"
                )


def test_batched_sorted_zbuffer_matches_flat():
    from simultaneous_diffusion_for_pointclouds_tpu.ops.scatter import (
        zbuffer_stats_sorted_batched,
    )

    rng = np.random.default_rng(2)
    b, m, row_segs = 3, 500, 33
    keys = rng.integers(0, row_segs - 1, (b, m)).astype(np.int32)
    value = rng.uniform(0, 10, (b, m)).astype(np.float32)
    payload = rng.normal(size=(b, m)).astype(np.float32)
    valid = rng.uniform(size=(b, m)) > 0.4

    got = zbuffer_stats_sorted_batched(keys, value, payload, valid, row_segs)
    live = row_segs - 1
    # oracle: per-row flat zbuffer_stats
    for r in range(b):
        ref = zbuffer_stats(keys[r], value[r], payload[r], valid[r], row_segs)
        for name in ref._fields:
            x = np.asarray(getattr(ref, name))[:live]
            y = np.asarray(getattr(got, name))[r * live:(r + 1) * live]
            np.testing.assert_allclose(x, y, rtol=1e-5, atol=1e-4,
                                       err_msg=f"row {r} {name}")
    assert got.sum_value.shape == (b * live + 1,)


def test_zbuffer_min2_matches_two_stats_calls():
    from simultaneous_diffusion_for_pointclouds_tpu.ops.scatter import zbuffer_min2

    for seed in range(3):
        rng = np.random.default_rng(seed + 100)
        n, segs = 4000, 97
        keys = rng.integers(0, segs - 1, n).astype(np.int32)
        value = rng.uniform(0, 10, n).astype(np.float32)
        p1 = rng.normal(size=n).astype(np.float32)
        p2 = rng.integers(0, 999, n).astype(np.float32)
        valid = rng.uniform(size=n) > 0.4

        a1 = zbuffer_stats(keys, value, p1, valid, segs)
        a2 = zbuffer_stats(keys, value, p2, valid, segs)
        b = zbuffer_min2(keys, value, p1, p2, valid, segs)
        live = slice(0, segs - 1)
        np.testing.assert_allclose(
            np.asarray(b.min_value)[live], np.asarray(a1.min_value)[live], rtol=1e-6
        )
        np.testing.assert_allclose(
            np.asarray(b.min_payload1)[live], np.asarray(a1.min_payload)[live], rtol=1e-6
        )
        np.testing.assert_allclose(
            np.asarray(b.min_payload2)[live], np.asarray(a2.min_payload)[live], rtol=1e-6
        )


def test_sorted_zbuffer_v3_more_elements_than_segments():
    # e < num_segments exercises the n = min(num_segments, e) compaction path
    from simultaneous_diffusion_for_pointclouds_tpu.ops.scatter import (
        zbuffer_stats_sorted_v3,
    )

    rng = np.random.default_rng(7)
    n, segs = 50, 200
    keys = rng.integers(0, segs - 1, n).astype(np.int32)
    value = rng.uniform(0, 10, n).astype(np.float32)
    payload = rng.normal(size=n).astype(np.float32)
    valid = rng.uniform(size=n) > 0.4
    a = zbuffer_stats(keys, value, payload, valid, segs)
    b = zbuffer_stats_sorted_v3(keys, value, payload, valid, segs)
    live = slice(0, segs - 1)
    for name in a._fields:
        np.testing.assert_allclose(
            np.asarray(getattr(a, name))[live],
            np.asarray(getattr(b, name))[live],
            rtol=1e-5, atol=1e-4, err_msg=name,
        )


def test_pallas_zbuffer_matches_batched_sort():
    """ops/zbuffer_pallas.py (interpret mode on CPU) vs the sort-based
    oracle, incl. an empty segment and an all-invalid row region."""
    from simultaneous_diffusion_for_pointclouds_tpu.ops.scatter import (
        zbuffer_stats_sorted_batched,
    )
    from simultaneous_diffusion_for_pointclouds_tpu.ops.zbuffer_pallas import (
        zbuffer_stats_sorted_batched_pallas,
    )

    for seed in range(2):
        rng = np.random.default_rng(seed + 11)
        b, m, row_segs = 2, 3000, 700
        keys = rng.integers(0, row_segs - 1, (b, m)).astype(np.int32)
        value = rng.uniform(0, 10, (b, m)).astype(np.float32)
        payload = rng.normal(size=(b, m)).astype(np.float32)
        valid = rng.uniform(size=(b, m)) > 0.4
        valid[0][keys[0] == 5] = False  # empty segment
        a = zbuffer_stats_sorted_batched(keys, value, payload, valid, row_segs)
        p = zbuffer_stats_sorted_batched_pallas(
            keys, value, payload, valid, row_segs, interpret=True
        )
        for name in a._fields:
            np.testing.assert_allclose(
                np.asarray(getattr(a, name)), np.asarray(getattr(p, name)),
                rtol=1e-5, atol=1e-5, err_msg=f"seed{seed} {name}",
            )


def test_dense_sentinel_matches_batched_sort():
    """zbuffer_stats_sorted_batched_dense — the auto-default merge impl
    off-TPU — vs the sort-based path, incl. empty segments and an
    all-invalid row."""
    from simultaneous_diffusion_for_pointclouds_tpu.ops.scatter import (
        zbuffer_stats_sorted_batched,
        zbuffer_stats_sorted_batched_dense,
    )

    for seed in range(3):
        rng = np.random.default_rng(seed + 21)
        b, m, row_segs = 3, 700, 41
        keys = rng.integers(0, row_segs - 1, (b, m)).astype(np.int32)
        value = rng.uniform(0, 10, (b, m)).astype(np.float32)
        payload = rng.normal(size=(b, m)).astype(np.float32)
        valid = rng.uniform(size=(b, m)) > 0.4
        valid[0][keys[0] == 5] = False  # empty segment
        valid[2] = False  # all-invalid row
        a = zbuffer_stats_sorted_batched(keys, value, payload, valid, row_segs)
        d = zbuffer_stats_sorted_batched_dense(
            keys, value, payload, valid, row_segs
        )
        for name in a._fields:
            np.testing.assert_allclose(
                np.asarray(getattr(a, name)), np.asarray(getattr(d, name)),
                rtol=1e-6, atol=1e-6, err_msg=f"seed{seed} {name}",
            )


def test_pallas_min2_matches_flat():
    """zbuffer_min2_batched_pallas (interpret) vs the flat zbuffer_min2 on
    row-major flattened keys — incl. integer ids in payload2 and a fully
    invalid row."""
    from simultaneous_diffusion_for_pointclouds_tpu.ops.scatter import (
        zbuffer_min2,
    )
    from simultaneous_diffusion_for_pointclouds_tpu.ops.zbuffer_pallas import (
        zbuffer_min2_batched_pallas,
    )

    rng = np.random.default_rng(3)
    b, m, row_segs = 2, 2500, 600
    live = row_segs - 1
    keys = rng.integers(0, live, (b, m)).astype(np.int32)
    value = rng.uniform(0, 10, (b, m)).astype(np.float32)
    p1 = rng.normal(size=(b, m)).astype(np.float32)
    p2 = rng.integers(0, 1 << 20, (b, m)).astype(np.float32)
    valid = rng.uniform(size=(b, m)) > 0.4
    valid[1] = False
    flat_keys = (keys + np.arange(b)[:, None] * live).reshape(-1)
    f = zbuffer_min2(
        flat_keys, value.reshape(-1), p1.reshape(-1), p2.reshape(-1),
        valid.reshape(-1), b * live + 1,
    )
    g = zbuffer_min2_batched_pallas(
        keys, value, p1, p2, valid, row_segs, interpret=True
    )
    for name in f._fields:
        np.testing.assert_allclose(
            np.asarray(getattr(f, name)), np.asarray(getattr(g, name)),
            rtol=1e-6, atol=1e-6, err_msg=name,
        )


def test_split3_exact():
    """The bf16 3-way split must reconstruct f32 exactly — a convert-based
    split silently degrades under --xla_allow_excess_precision."""
    from simultaneous_diffusion_for_pointclouds_tpu.ops.zbuffer_pallas import (
        _split3,
    )

    x = jnp.asarray(
        np.random.default_rng(0).uniform(-100, 100, 4096), jnp.float32
    )
    h, m, l = _split3(x)
    rec = (
        h.astype(jnp.float32) + m.astype(jnp.float32) + l.astype(jnp.float32)
    )
    assert float(jnp.max(jnp.abs(rec - x))) == 0.0


@pytest.mark.slow
def test_batched_gather_compaction_matches_batched_sort():
    from simultaneous_diffusion_for_pointclouds_tpu.ops.scatter import (
        zbuffer_stats_sorted_batched,
        zbuffer_stats_sorted_batched_gather,
    )

    # m=512 (power of two) regression: the binary search needs
    # m.bit_length() rounds; (m-1).bit_length() was one short
    for seed, m in ((0, 500), (1, 500), (2, 512)):
        rng = np.random.default_rng(seed + 7)
        b, row_segs = 3, 33
        keys = rng.integers(0, row_segs - 1, (b, m)).astype(np.int32)
        value = rng.uniform(0, 10, (b, m)).astype(np.float32)
        payload = rng.normal(size=(b, m)).astype(np.float32)
        valid = rng.uniform(size=(b, m)) > 0.4
        a = zbuffer_stats_sorted_batched(keys, value, payload, valid, row_segs)
        g = zbuffer_stats_sorted_batched_gather(keys, value, payload, valid, row_segs)
        for name in a._fields:
            np.testing.assert_allclose(
                np.asarray(getattr(a, name)), np.asarray(getattr(g, name)),
                rtol=1e-6, atol=1e-6, err_msg=name,
            )


def test_segment_sums_sorted_pallas_matches_segment_sum():
    """segment_sums_sorted_pallas (interpret mode) vs jax.ops.segment_sum
    on a dense sorted id stream — incl. multi-group streams (n > one
    INNER*CHUNK block forces the group-partial slice-add recombination)
    and the block-padding trash path."""
    import jax

    from simultaneous_diffusion_for_pointclouds_tpu.ops.zbuffer_pallas import (
        segment_sums_sorted_pallas,
    )

    for seed, nseg_live in ((0, 700), (3, 1), (5, 4000)):
        rng = np.random.default_rng(seed)
        reps = rng.integers(1, 9, nseg_live)
        ids = np.sort(np.repeat(np.arange(nseg_live), reps)).astype(np.int32)
        n = len(ids)
        nseg = nseg_live + 1
        chans = [rng.normal(size=n).astype(np.float32) for _ in range(4)]
        sums, cnt = segment_sums_sorted_pallas(
            jnp.asarray(ids),
            tuple(jnp.asarray(c) for c in chans),
            nseg,
            interpret=True,
        )
        np.testing.assert_array_equal(
            np.asarray(cnt), np.bincount(ids, minlength=nseg).astype(np.float32)
        )
        for i, c in enumerate(chans):
            ref = jax.ops.segment_sum(jnp.asarray(c), jnp.asarray(ids), nseg)
            np.testing.assert_allclose(
                np.asarray(sums[i]), np.asarray(ref), rtol=1e-5, atol=1e-5
            )


def test_sort_payload_iota_mode_matches_carry():
    """The iota-gather payload routing (round-4 sort lever) is bit-identical
    to carrying payloads through the 2-key sort (stable sort => same perm)."""
    from simultaneous_diffusion_for_pointclouds_tpu.ops import zbuffer_pallas as zp

    rng = np.random.default_rng(0)
    b, m, live = 2, 600, 96
    keys = jnp.asarray(rng.integers(0, live, (b, m)), jnp.int32)
    value = jnp.asarray(rng.uniform(0.1, 5.0, (b, m)), jnp.float32)
    p1 = jnp.asarray(rng.uniform(-1, 1, (b, m)), jnp.float32)
    p2 = jnp.asarray(rng.integers(0, 1000, (b, m)), jnp.float32)
    valid = jnp.asarray(rng.uniform(size=(b, m)) > 0.3)

    def run():
        return zp.zbuffer_min2_batched_pallas(
            keys, value, p1, p2, valid, live + 1, interpret=True
        )

    base = run()
    zp.SORT_PAYLOAD_MODE = "iota"
    try:
        alt = run()
    finally:
        zp.SORT_PAYLOAD_MODE = "carry"
    for a, c in zip(alt, base):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(c))
