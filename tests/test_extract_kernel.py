"""ops/pallas/extract.py: threshold-select + row-sparse extraction.

Parity targets: the in-kernel rank must equal dist_exec._orderable_rank
bit-for-bit, and extraction must reproduce a reference mask-compaction
exactly (stably) for every key class.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from igloo_tpu.ops.pallas.extract import extract_candidate_rows
from igloo_tpu.parallel.dist_exec import _orderable_rank

N = 32768 * 2


def _thr_words(t_i, ranks):
    w = [np.int32(t_i)]
    for r in ranks:
        r = np.uint64(r)
        w.append(np.uint32(r >> np.uint64(32)).astype(np.int32))
        w.append(np.uint32(r & np.uint64(0xFFFFFFFF)).astype(np.int32))
    return jnp.asarray(np.array(w, dtype=np.int32))


def _run(key_arrays, key_meta, alive, thr_ranks, t_i, cap_rows=256):
    """key_meta: per key (klass, valid or None, asc, nf)."""
    planes, valids, specs = [], [], []
    for (klass, valid, asc, nf), a in zip(key_meta, key_arrays):
        pl0 = len(planes)
        if klass == "i64":
            w = jax.lax.bitcast_convert_type(jnp.asarray(a), jnp.int32)
            planes += [w[:, 1], w[:, 0]]   # hi word, lo word
            pidx = (pl0, pl0 + 1)
        elif klass == "i32":
            planes += [jnp.asarray(a, jnp.int32)]
            pidx = (pl0,)
        elif klass == "fbits":
            bits = jax.lax.bitcast_convert_type(
                jnp.asarray(a, jnp.float32), jnp.int32)
            planes += [bits]
            pidx = (pl0,)
        vi = len(valids)
        if valid is not None:
            valids.append(jnp.asarray(valid))
            specs.append((klass, True, asc, nf, pidx, vi))
        else:
            specs.append((klass, False, asc, nf, pidx, 0))
    thr = _thr_words(t_i, thr_ranks)
    return extract_candidate_rows(
        thr, jnp.asarray(alive), tuple(planes), tuple(valids),
        key_specs=tuple(specs), cap_rows=cap_rows,
        interpret=jax.default_backend() != "tpu")


def _reference_cand(ranks, idx_d, alive, thr_ranks, t_i):
    cond = idx_d <= t_i
    for rk, tk in zip(reversed(ranks), reversed(thr_ranks)):
        cond = (rk < tk) | ((rk == tk) & cond)
    return alive & cond


def _check_extraction(planes_in, out_planes, out_mask, stats, cand):
    rows_used = int(stats[0])
    m = np.array(out_mask).reshape(-1)
    m[rows_used * 128:] = 0
    got_sel = [np.asarray(p).reshape(-1)[m > 0] for p in out_planes]
    want_sel = [np.asarray(p)[np.asarray(cand)] for p in planes_in]
    for g, w in zip(got_sel, want_sel):
        np.testing.assert_array_equal(g, w)
    assert int(stats[1]) == int(np.sum(np.asarray(cand)))
    assert int(stats[3]) == 0


def test_i64_key_sparse():
    rng = np.random.default_rng(0)
    k = rng.integers(-(1 << 62), 1 << 62, N).astype(np.int64)
    alive = np.ones(N, bool)
    alive[::97] = False
    rank = np.asarray(_orderable_rank(jnp.asarray(k), None, True, True))
    thr = np.sort(rank)[N // 500]                      # ~0.2% selected
    out_planes, _, out_mask, stats = _run(
        [k], [("i64", None, True, True)], alive, [thr], N)
    cand = (rank <= thr) & alive
    w = jax.lax.bitcast_convert_type(jnp.asarray(k), jnp.int32)
    _check_extraction([np.asarray(w[:, 1]), np.asarray(w[:, 0])],
                      out_planes, out_mask, stats, cand)


def test_i32_key_desc_with_nulls():
    rng = np.random.default_rng(1)
    k = rng.integers(-1000, 1000, N).astype(np.int32)
    valid = rng.random(N) > 0.1
    alive = np.ones(N, bool)
    rank = np.asarray(_orderable_rank(jnp.asarray(k), jnp.asarray(valid),
                                      False, False))
    idx = np.arange(N, dtype=np.int32)
    thr = np.sort(rank)[N // 100]
    t_i = N  # tiebreak always true
    out_planes, out_valids, out_mask, stats = _run(
        [k], [("i32", valid, False, False)], alive, [thr], t_i,
        cap_rows=1024)
    cand = _reference_cand([rank], idx, alive, [thr], t_i)
    _check_extraction([k], out_planes, out_mask, stats, cand)
    # validity plane travels with rows
    rows_used = int(stats[0])
    m = np.array(out_mask).reshape(-1)
    m[rows_used * 128:] = 0
    got_v = np.asarray(out_valids[0]).reshape(-1)[m > 0]
    np.testing.assert_array_equal(got_v != 0, valid[np.asarray(cand)])


def test_f32_key():
    rng = np.random.default_rng(2)
    k = (rng.standard_normal(N) * 100).astype(np.float32)
    alive = np.ones(N, bool)
    rank = np.asarray(_orderable_rank(jnp.asarray(k), None, True, True))
    thr = np.sort(rank)[N // 200]
    out_planes, _, out_mask, stats = _run(
        [k], [("fbits", None, True, True)], alive, [thr], N,
        cap_rows=512)
    cand = (rank <= thr) & alive
    bits = jax.lax.bitcast_convert_type(jnp.asarray(k), jnp.int32)
    _check_extraction([np.asarray(bits)], out_planes, out_mask, stats, cand)


def test_multikey_tiebreak_dense():
    rng = np.random.default_rng(3)
    a = rng.integers(0, 3, N).astype(np.int32)       # duplicate-heavy
    b = rng.integers(0, 1 << 40, N).astype(np.int64)
    alive = rng.random(N) > 0.2
    r_a = np.asarray(_orderable_rank(jnp.asarray(a), None, True, True))
    r_b = np.asarray(_orderable_rank(jnp.asarray(b), None, False, True))
    idx = np.arange(N, dtype=np.int32)
    order = np.lexsort((idx, r_b, r_a))
    live_order = order[alive[order]]
    j = 500
    t_a, t_b, t_i = (r_a[live_order[j]], r_b[live_order[j]],
                     idx[live_order[j]])
    out_planes, _, out_mask, stats = _run(
        [a, b], [("i32", None, True, True), ("i64", None, False, True)],
        alive, [t_a, t_b], t_i, cap_rows=1024)
    cand = _reference_cand([r_a, r_b], idx, alive, [t_a, t_b], t_i)
    assert int(np.sum(cand)) == j + 1
    w = jax.lax.bitcast_convert_type(jnp.asarray(b), jnp.int32)
    _check_extraction([a, np.asarray(w[:, 1]), np.asarray(w[:, 0])],
                      out_planes, out_mask, stats, cand)


def test_overflow_flag():
    k = np.arange(N, dtype=np.int64)
    alive = np.ones(N, bool)
    rank = np.asarray(_orderable_rank(jnp.asarray(k), None, True, True))
    thr = rank[-1]                                    # everything selected
    _, _, _, stats = _run([k], [("i64", None, True, True)], alive,
                          [thr], N, cap_rows=256)
    assert int(stats[3]) == 1
