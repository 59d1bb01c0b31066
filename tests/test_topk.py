"""hierarchical_top_k: exactness vs lax.top_k across shapes and ties."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from care_tpu.ops.topk import hierarchical_top_k


@pytest.mark.parametrize("v,k,chunk", [
    (55000, 5, 1024),   # beam*vocab shape
    (4096, 5, 1024),
    (1000, 3, 128),     # V not a chunk multiple
    (100, 5, 1024),     # small V -> falls back to lax.top_k
    (2048, 1, 512),
])
def test_matches_lax_topk(v, k, chunk):
    x = jnp.asarray(np.random.RandomState(0).randn(7, v), jnp.float32)
    vw, iw = jax.lax.top_k(x, k)
    vh, ih = hierarchical_top_k(x, k, chunk_size=chunk)
    np.testing.assert_array_equal(np.asarray(vw), np.asarray(vh))
    np.testing.assert_array_equal(np.asarray(iw), np.asarray(ih))


def test_ties_take_lowest_index():
    x = jnp.zeros((2, 4096), jnp.float32).at[:, 100].set(1.0)
    v, i = hierarchical_top_k(x, 3, chunk_size=512)
    assert int(i[0, 0]) == 100
    # remaining ties (all zeros) resolve lowest-index-first like lax.top_k
    vw, iw = jax.lax.top_k(x, 3)
    np.testing.assert_array_equal(np.asarray(iw), np.asarray(i))


def test_padding_never_selected():
    # V chosen so padding is required; all values very negative except a few
    x = jnp.full((1, 1030), -1e9, jnp.float32)
    x = x.at[0, 1029].set(5.0).at[0, 0].set(4.0)
    v, i = hierarchical_top_k(x, 2, chunk_size=512)
    assert sorted(np.asarray(i)[0].tolist()) == [0, 1029]


@pytest.mark.parametrize("k", [9, 16])
def test_large_k_chunked_path_matches(k):
    """k above the iterative threshold goes through the chunked two-stage
    path; still exact."""
    x = jnp.asarray(np.random.RandomState(1).randn(5, 20000), jnp.float32)
    vw, iw = jax.lax.top_k(x, k)
    vh, ih = hierarchical_top_k(x, k, chunk_size=1024)
    np.testing.assert_array_equal(np.asarray(vw), np.asarray(vh))
    np.testing.assert_array_equal(np.asarray(iw), np.asarray(ih))


def test_iterative_multi_leading_dims_and_ties():
    from care_tpu.ops.topk import _iterative_top_k
    rs = np.random.RandomState(2)
    x = rs.randn(3, 4, 9000).astype(np.float32)
    x[:, :, 17] = x[:, :, 18] = 7.5  # exact ties
    vw, iw = jax.lax.top_k(jnp.asarray(x), 4)
    vh, ih = _iterative_top_k(jnp.asarray(x), 4)
    np.testing.assert_array_equal(np.asarray(vw), np.asarray(vh))
    np.testing.assert_array_equal(np.asarray(iw), np.asarray(ih))


def test_iterative_rows_with_fewer_than_k_finite_entries():
    """All--inf tails must yield DISTINCT indices in lax.top_k order
    (a plain argmax+mask loop would return duplicate index 0)."""
    from care_tpu.ops.topk import _iterative_top_k
    x = np.full((2, 9000), -np.inf, np.float32)
    x[0, 10], x[0, 20] = 1.0, 0.5
    x[1, 8999] = 2.0
    vw, iw = jax.lax.top_k(jnp.asarray(x), 5)
    vh, ih = _iterative_top_k(jnp.asarray(x), 5)
    np.testing.assert_array_equal(np.asarray(vw), np.asarray(vh))
    np.testing.assert_array_equal(np.asarray(iw), np.asarray(ih))
    assert len(set(np.asarray(ih)[0].tolist())) == 5  # distinct


def test_chunked_iterative_exact_randomized_and_ties():
    """The single-wide-pass chunk-maxima path (the assume_finite beam
    dispatch): exact lax.top_k values, indices, and tie order across
    random shapes/chunk sizes and adversarial tie layouts."""
    from care_tpu.ops.topk import _chunked_iterative_top_k
    rs = np.random.RandomState(0)
    leads = [(), (3,), (2, 4)]
    for trial in range(20):
        V = rs.randint(2000, 60000)
        k = rs.randint(1, 9)
        lead = leads[rs.randint(3)]
        # quantized values -> heavy exact ties
        x = np.round(rs.randn(*(lead + (V,))) * 2).astype(np.float32)
        cs = int([128, 256, 512, 1000][rs.randint(4)])
        vw, iw = jax.lax.top_k(jnp.asarray(x), k)
        vc, ic = _chunked_iterative_top_k(jnp.asarray(x), k, chunk_size=cs)
        np.testing.assert_array_equal(np.asarray(vw), np.asarray(vc),
                                      err_msg=f"{trial} {V} {k} {cs}")
        np.testing.assert_array_equal(np.asarray(iw), np.asarray(ic),
                                      err_msg=f"{trial} {V} {k} {cs}")
    # all-equal rows: every pick is a global tie
    x = jnp.zeros((4, 7000), jnp.float32)
    _, iw = jax.lax.top_k(x, 5)
    _, ic = _chunked_iterative_top_k(x, 5, chunk_size=512)
    np.testing.assert_array_equal(np.asarray(iw), np.asarray(ic))
    # duplicates inside one chunk AND straddling a chunk boundary
    x = np.full((2, 4096), -1.0, np.float32)
    x[:, 510:515] = 7.0
    x[:, 1024] = 7.0
    _, iw = jax.lax.top_k(jnp.asarray(x), 6)
    _, ic = _chunked_iterative_top_k(jnp.asarray(x), 6, chunk_size=512)
    np.testing.assert_array_equal(np.asarray(iw), np.asarray(ic))


def test_assume_finite_matches_exact_on_finite_inputs():
    from care_tpu.ops.topk import _iterative_top_k
    rs = np.random.RandomState(3)
    x = jnp.asarray(rs.randn(6, 30000).astype(np.float32) * 100)
    v1, i1 = _iterative_top_k(x, 5)
    v2, i2 = _iterative_top_k(x, 5, assume_finite=True)
    vw, iw = jax.lax.top_k(x, 5)
    np.testing.assert_array_equal(np.asarray(v1), np.asarray(vw))
    np.testing.assert_array_equal(np.asarray(v2), np.asarray(vw))
    np.testing.assert_array_equal(np.asarray(i1), np.asarray(iw))
    np.testing.assert_array_equal(np.asarray(i2), np.asarray(iw))
