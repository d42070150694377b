"""Pallas kernel tests — run in interpreter mode on CPU (compiled mode is
exercised on real TPU by bench --pallas)."""

import numpy as np
import pytest

import jax

from gpu_olap_tpu.ops.pallas import filter_agg, partition, seg_agg


@pytest.fixture(autouse=True)
def _interpret_mode(monkeypatch):
    from jax.experimental.pallas import tpu as pltpu

    with pltpu.force_tpu_interpret_mode():
        yield


def test_filter_count_sum_i32():
    rng = np.random.default_rng(0)
    n = 100_000
    v = rng.integers(0, 1000, n).astype(np.int32)
    n_valid = n - 5000  # padded tail must be ignored
    cnt, s = filter_agg.filter_count_sum_i32(jax.numpy.asarray(v), 500, n_valid)
    exp_mask = (v[:n_valid] > 500)
    assert int(cnt) == exp_mask.sum()
    np.testing.assert_allclose(float(s), v[:n_valid][exp_mask].sum(), rtol=1e-6)


def test_filter_count_sum_exact_i32():
    rng = np.random.default_rng(1)
    n = 70_000  # non multiple of block
    v = rng.integers(0, 1 << 30, n).astype(np.int32)
    cnt, s = filter_agg.filter_count_sum_exact_i32(jax.numpy.asarray(v),
                                                   1 << 29, n)
    mask = v > (1 << 29)
    assert int(cnt) == mask.sum()
    assert int(s) == int(v[mask].astype(np.int64).sum())  # bit exact


def test_radix_histogram():
    rng = np.random.default_rng(2)
    n = 40_000
    keys = rng.integers(0, 1 << 20, n).astype(np.int32)
    hist = partition.radix_histogram_i32(jax.numpy.asarray(keys), shift=0)
    exp = np.bincount(keys & 0xFF, minlength=256)
    np.testing.assert_array_equal(np.asarray(hist), exp)
    hist8 = partition.radix_histogram_i32(jax.numpy.asarray(keys), shift=8)
    exp8 = np.bincount((keys >> 8) & 0xFF, minlength=256)
    np.testing.assert_array_equal(np.asarray(hist8), exp8)
    offs = partition.partition_offsets(hist)
    assert int(np.asarray(offs)[0]) == 0
    assert int(np.asarray(offs)[-1]) == n - exp[-1]


def _seg_agg_oracle(keys, vals):
    """NumPy oracle: per-run key/count/sum/min/max over sorted (keys, vals)."""
    flags = np.concatenate([[True], keys[1:] != keys[:-1]])
    starts = np.flatnonzero(flags)
    ends = np.concatenate([starts[1:], [len(keys)]])
    out = []
    for s, e in zip(starts, ends):
        seg = vals[s:e].astype(np.int64)
        out.append((keys[s], e - s, seg.sum(), seg.min(), seg.max()))
    return out


def _run_seg_agg(keys, vals, max_groups):
    k, c, s, mn, mx, ng = seg_agg.seg_agg_sorted_i32(
        jax.numpy.asarray(keys), jax.numpy.asarray(vals), max_groups, True)
    ng = int(ng)
    return (np.asarray(k), np.asarray(c), np.asarray(s),
            np.asarray(mn), np.asarray(mx), ng)


def _check_seg_agg(keys, vals, max_groups=None):
    exp = _seg_agg_oracle(keys, vals)
    if max_groups is None:
        max_groups = len(exp) + 8
    k, c, s, mn, mx, ng = _run_seg_agg(keys, vals, max_groups)
    assert ng == len(exp)
    for g, (ek, ec, es, emn, emx) in enumerate(exp):
        assert k[g] == ek, (g, k[g], ek)
        assert c[g] == ec, (g, c[g], ec)
        assert s[g] == es, (g, s[g], es)
        assert mn[g] == emn, (g, mn[g], emn)
        assert mx[g] == emx, (g, mx[g], emx)


def test_seg_agg_basic_runs():
    """Random duplicate-heavy sorted keys, one superblock."""
    rng = np.random.default_rng(10)
    n = seg_agg.SB
    keys = np.sort(rng.integers(0, n // 16, n)).astype(np.int32)
    # ride-the-sort invariant: values ascend within each group
    vals = rng.integers(-1_000_000, 1_000_000, n).astype(np.int32)
    order = np.lexsort((vals, keys))
    _check_seg_agg(keys, vals[order])


def test_seg_agg_superblock_boundary_carry():
    """Groups spanning chunk and superblock boundaries; 2 grid steps."""
    n = 2 * seg_agg.SB
    # one giant group covering all of superblock 0 and half of superblock 1,
    # then alternating tiny groups
    keys = np.empty(n, dtype=np.int32)
    half = n // 2 + seg_agg.SB // 2
    keys[:half] = 7
    keys[half:] = 100 + np.arange(n - half, dtype=np.int32) // 3
    vals = np.arange(n, dtype=np.int32) % 4096
    order = np.lexsort((vals, keys))
    _check_seg_agg(keys[order], vals[order])


def test_seg_agg_every_row_new_group():
    """nloc == CHUNK stress: all keys distinct."""
    n = seg_agg.SB
    keys = np.arange(n, dtype=np.int32) * 3 - n
    vals = np.full(n, -5, dtype=np.int32)
    _check_seg_agg(keys, vals, max_groups=n + 4)


def test_seg_agg_sentinel_padding():
    """Padded rows masked to INT32_MAX form one trailing sentinel group."""
    rng = np.random.default_rng(11)
    n = 8 * seg_agg.SB
    n_valid = n - 12345
    keys = np.full(n, np.iinfo(np.int32).max, dtype=np.int32)
    keys[:n_valid] = np.sort(rng.integers(0, 500, n_valid)).astype(np.int32)
    vals = np.zeros(n, dtype=np.int32)
    vals[:n_valid] = rng.integers(0, 1000, n_valid).astype(np.int32)
    order = np.lexsort((vals[:n_valid], keys[:n_valid]))
    keys[:n_valid] = keys[:n_valid][order]
    vals[:n_valid] = vals[:n_valid][order]
    exp = _seg_agg_oracle(keys[:n_valid], vals[:n_valid])
    k, c, s, mn, mx, ng = _run_seg_agg(keys, vals, len(exp) + 8)
    assert ng == len(exp) + 1  # + sentinel group
    for g, (ek, ec, es, emn, emx) in enumerate(exp):
        assert (k[g], c[g], s[g], mn[g], mx[g]) == (ek, ec, es, emn, emx)
    assert k[len(exp)] == np.iinfo(np.int32).max
    assert c[len(exp)] == n - n_valid


def test_seg_agg_overflow_exact_count():
    """Capacity overflow drops trailing groups but n_groups stays exact."""
    n = seg_agg.SB
    keys = np.arange(n, dtype=np.int32)
    vals = np.ones(n, dtype=np.int32)
    k, c, s, mn, mx, ng = _run_seg_agg(keys, vals, 64)
    assert ng == n
    assert k[0] == 0 and c[0] == 1 and s[0] == 1


def test_seg_agg_multiple_flushes():
    """>3 staging flushes (2048 groups each): random group sizes, many blocks."""
    rng = np.random.default_rng(12)
    sizes = rng.integers(1, 9, 9000)
    keys = np.repeat(np.arange(len(sizes), dtype=np.int32) * 7 - 100, sizes)
    n = len(keys)
    pad = (-n) % seg_agg.SB
    keys = np.concatenate([keys, np.full(pad, np.iinfo(np.int32).max, np.int32)])
    vals = rng.integers(-(1 << 30), 1 << 30, len(keys)).astype(np.int32)
    order = np.lexsort((vals, keys))
    _check_seg_agg(keys[order], vals[order], max_groups=9010)


def test_seg_agg_giant_group_across_flush():
    """A group spanning many blocks right at a flush boundary, extreme values."""
    n = 8 * seg_agg.SB
    keys = np.empty(n, dtype=np.int32)
    keys[:2047] = np.arange(2047, dtype=np.int32)      # fill staging to 2047
    keys[2047:6 * seg_agg.SB] = 2047                   # giant group over blocks
    rest = n - 6 * seg_agg.SB
    keys[6 * seg_agg.SB:] = 2048 + np.arange(rest, dtype=np.int32) // 5
    vals = np.full(n, (1 << 31) - 1, dtype=np.int32)   # int64-sum stress
    vals[::3] = -(1 << 31)
    order = np.lexsort((vals, keys))
    _check_seg_agg(keys[order], vals[order], max_groups=2048 + rest)


def test_seg_agg_fuzz_vs_oracle():
    rng = np.random.default_rng(13)
    for trial in range(4):
        nblk = int(rng.integers(1, 7))
        n = nblk * seg_agg.SB
        ng = int(rng.integers(1, n + 1))
        keys = np.sort(rng.integers(-(1 << 28), 1 << 28, ng))[
            rng.integers(0, ng, n)].astype(np.int32)
        vals = rng.integers(-(1 << 31), 1 << 31, n).astype(np.int32)
        order = np.lexsort((vals, keys))
        _check_seg_agg(keys[order], vals[order], max_groups=n + 8)


# ---------------------------------------------------------------------------
# sorted-space join kernels (ops/pallas/join_stream.py)
# ---------------------------------------------------------------------------

from gpu_olap_tpu.ops.pallas import join_stream as js  # noqa: E402


def _pad_to(x, mult, fill):
    pad = (-len(x)) % mult
    return np.concatenate([x, np.full(pad, fill, x.dtype)])


def test_stream_compact_basic():
    rng = np.random.default_rng(20)
    n = 6 * js.SB
    mask = (rng.random(n) < 0.3)
    a = rng.integers(-(1 << 31), 1 << 31, n).astype(np.int32)
    b = rng.integers(-(1 << 31), 1 << 31, n).astype(np.int32)
    outs, cnt = js.stream_compact_i32(
        jax.numpy.asarray(mask), [jax.numpy.asarray(a), jax.numpy.asarray(b)],
        int(mask.sum()) + 8, True)
    cnt = int(cnt)
    assert cnt == mask.sum()
    np.testing.assert_array_equal(np.asarray(outs[0])[:cnt], a[mask])
    np.testing.assert_array_equal(np.asarray(outs[1])[:cnt], b[mask])


def test_stream_compact_extremes():
    # all-set, none-set, flush-boundary-exact blocks
    n = 4 * js.SB
    a = np.arange(n, dtype=np.int32)
    for mask in (np.ones(n, bool), np.zeros(n, bool),
                 np.arange(n) % 2 == 0):
        outs, cnt = js.stream_compact_i32(
            jax.numpy.asarray(mask), [jax.numpy.asarray(a)],
            int(mask.sum()) + 8, True)
        cnt = int(cnt)
        assert cnt == mask.sum()
        np.testing.assert_array_equal(np.asarray(outs[0])[:cnt], a[mask])


def test_expand_fill_basic():
    rng = np.random.default_rng(21)
    m = 3000
    cnts = rng.integers(1, 6, m).astype(np.int64)
    starts = np.concatenate([[0], np.cumsum(cnts)[:-1]]).astype(np.int32)
    total = int(cnts.sum())
    va = rng.integers(-(1 << 31), 1 << 31, m).astype(np.int32)
    vb = rng.integers(0, 1 << 30, m).astype(np.int32)
    cap = -(-total // js.SB) * js.SB
    sp = _pad_to(starts, js.SB, np.iinfo(np.int32).max)
    if len(sp) - m < 2304:
        sp = np.concatenate([sp, np.full(js.SB * 2, np.iinfo(np.int32).max,
                                         np.int32)])
    pad_len = len(sp)
    off, fa, fb = js.expand_fill_i32(
        jax.numpy.asarray(sp),
        [jax.numpy.asarray(_pad_to(va, 1, 0)[np.arange(pad_len) % m]
                           if False else np.resize(va, pad_len)),
         jax.numpy.asarray(np.resize(vb, pad_len))], cap, True)
    off, fa, fb = (np.asarray(x)[:total] for x in (off, fa, fb))
    exp_rec = np.repeat(np.arange(m), cnts)
    exp_off = np.arange(total) - starts.astype(np.int64)[exp_rec]
    np.testing.assert_array_equal(off, exp_off)
    np.testing.assert_array_equal(fa, va[exp_rec])
    np.testing.assert_array_equal(fb, vb[exp_rec])


def test_expand_fill_long_runs_and_block_spans():
    # runs that span multiple 2048-slot output blocks + single giant run
    cnts = np.array([5000, 1, 1, 7000, 2048, 2, 4096], dtype=np.int64)
    m = len(cnts)
    starts = np.concatenate([[0], np.cumsum(cnts)[:-1]]).astype(np.int32)
    total = int(cnts.sum())
    va = np.arange(m, dtype=np.int32) * 7 - 3
    cap = -(-total // js.SB) * js.SB
    pad_len = -(-(m + 2304) // js.SB) * js.SB
    sp = _pad_to(starts, 1, 0)
    sp = np.concatenate([sp, np.full(pad_len - m, np.iinfo(np.int32).max,
                                     np.int32)])
    off, fa = js.expand_fill_i32(
        jax.numpy.asarray(sp), [jax.numpy.asarray(np.resize(va, pad_len))],
        cap, True)
    off, fa = np.asarray(off)[:total], np.asarray(fa)[:total]
    exp_rec = np.repeat(np.arange(m), cnts)
    exp_off = np.arange(total) - starts.astype(np.int64)[exp_rec]
    np.testing.assert_array_equal(off, exp_off)
    np.testing.assert_array_equal(fa, va[exp_rec])


def test_partition_histogram_routes_through_pallas():
    """>=32K-row capacity planning engages the Pallas radix histogram
    (engine consumer for ops/pallas/partition.py) — counter + parity."""
    from gpu_olap_tpu.ops.hashing import partition_of
    from gpu_olap_tpu.parallel import skew
    from gpu_olap_tpu.utils.metrics import GLOBAL_METRICS

    rng = np.random.default_rng(5)
    keys = jax.numpy.asarray(rng.integers(0, 1 << 30, 50_000).astype(np.int32))
    before = GLOBAL_METRICS.counters.get("pallas_radix_hist_trace", 0)
    hist = np.asarray(skew.partition_histogram(keys, 8))
    assert GLOBAL_METRICS.counters.get("pallas_radix_hist_trace", 0) > before
    dest = np.asarray(partition_of(keys, 8))
    np.testing.assert_array_equal(hist, np.bincount(dest, minlength=8))
