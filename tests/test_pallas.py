"""Pallas kernel-plane parity tests (run on CPU via the TPU-semantics
interpreter; the same kernel compiles with Mosaic on the chip).

The fan-draw kernel consumes jax.random uniforms, so its output is
bit-exact equal to the jnp one-hot path for the same PRNG key — asserted
here end-to-end through ``sample_neighbor_fast``.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from euler_tpu.ops import pallas_fan, sampling
from euler_tpu.ops.alias import (FAN_ALIAS_OFF, FAN_D, FAN_KEPT_OFF,
                                 FAN_PROB_OFF)


@pytest.fixture(autouse=True)
def _reset_flag():
    yield
    pallas_fan.set_enabled(None)


def test_fan_draw_selects_expected_bank_values():
    rng = np.random.default_rng(0)
    B, C = 32, 16
    packs = np.zeros((B, 128), np.int32)
    deg = rng.integers(1, FAN_D + 1, B).astype(np.int32)
    packs[:, 0] = deg
    prob = rng.random((B, FAN_D)).astype(np.float32)
    packs[:, FAN_PROB_OFF:FAN_PROB_OFF + FAN_D] = prob.view(np.int32)
    packs[:, FAN_KEPT_OFF:FAN_KEPT_OFF + FAN_D] = 1000 + np.arange(FAN_D)
    packs[:, FAN_ALIAS_OFF:FAN_ALIAS_OFF + FAN_D] = 2000 + np.arange(FAN_D)
    u1 = rng.random((B, C)).astype(np.float32)
    u2 = rng.random((B, C)).astype(np.float32)
    out = np.asarray(pallas_fan.fan_draw(
        jnp.asarray(packs), jnp.asarray(u1), jnp.asarray(u2),
        interpret=True))
    slot = np.minimum((u1 * deg[:, None]).astype(np.int32),
                      deg[:, None] - 1)
    keep = u2 < prob[np.arange(B)[:, None], slot]
    expect = np.where(keep, 1000 + slot, 2000 + slot)
    np.testing.assert_array_equal(out, expect)


def test_fan_draw_ragged_tail_block():
    # B not a multiple of the block size: the padded tail rows must not
    # corrupt the valid rows
    rng = np.random.default_rng(1)
    B, C = 13, 4
    packs = np.zeros((B, 128), np.int32)
    packs[:, 0] = 3
    packs[:, FAN_PROB_OFF:FAN_PROB_OFF + FAN_D] = \
        np.float32(1.0).view(np.int32)
    packs[:, FAN_KEPT_OFF:FAN_KEPT_OFF + FAN_D] = 7
    packs[:, FAN_ALIAS_OFF:FAN_ALIAS_OFF + FAN_D] = 7
    u = rng.random((B, C)).astype(np.float32)
    out = np.asarray(pallas_fan.fan_draw(
        jnp.asarray(packs), jnp.asarray(u), jnp.asarray(u),
        tb=8, interpret=True))
    assert (out == 7).all()


def test_sample_neighbor_fast_pallas_bit_exact(toy_graph):
    g = toy_graph.tensors
    et = g.meta.edge_types.index("click")
    nodes = jnp.asarray([toy_graph.local_id(100), toy_graph.local_id(107),
                         -1], jnp.int32)
    key = jax.random.PRNGKey(11)

    pallas_fan.set_enabled(False)
    ref_ids, ref_valid = sampling.sample_neighbor_fast(
        g, key, nodes, (et,), 64)
    pallas_fan.set_enabled(True)
    got_ids, got_valid = sampling.sample_neighbor_fast(
        g, key, nodes, (et,), 64)

    np.testing.assert_array_equal(np.asarray(ref_ids), np.asarray(got_ids))
    np.testing.assert_array_equal(np.asarray(ref_valid),
                                  np.asarray(got_valid))


def test_sample_neighbor_fast_pallas_distribution(toy_graph):
    g = toy_graph.tensors
    et = g.meta.edge_types.index("click")
    nodes = jnp.asarray([toy_graph.local_id(100)], jnp.int32)
    pallas_fan.set_enabled(True)
    nbr, valid = sampling.sample_neighbor_fast(
        g, jax.random.PRNGKey(4), nodes, (et,), 20_000)
    assert bool(np.asarray(valid).all())
    exts = toy_graph.ext_ids[np.asarray(nbr)[0]]
    np.testing.assert_allclose((exts == 103).mean(), 0.75, atol=0.02)


def test_env_flag_controls_default(monkeypatch):
    pallas_fan.set_enabled(None)
    monkeypatch.delenv("EULER_TPU_PALLAS", raising=False)
    assert not pallas_fan.enabled()
    monkeypatch.setenv("EULER_TPU_PALLAS", "1")
    assert pallas_fan.enabled()


def test_fan_draw_race_free():
    """Run the kernel under the interpreter's race detector (the
    sanitizer role SURVEY §5 notes the reference lacks entirely)."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu
    import functools
    from euler_tpu.ops.pallas_fan import _draw_kernel

    rng = np.random.default_rng(2)
    B, C, tb = 32, 8, 16
    packs = np.zeros((B, 128), np.int32)
    packs[:, 0] = rng.integers(1, FAN_D + 1, B)
    packs[:, FAN_PROB_OFF:FAN_PROB_OFF + FAN_D] = \
        np.float32(1.0).view(np.int32)
    packs[:, FAN_KEPT_OFF:FAN_KEPT_OFF + FAN_D] = 5
    packs[:, FAN_ALIAS_OFF:FAN_ALIAS_OFF + FAN_D] = 5
    u = rng.random((B, C)).astype(np.float32)
    spec_p = pl.BlockSpec((tb, 128), lambda i, j: (i, 0),
                          memory_space=pltpu.VMEM)
    spec_u = pl.BlockSpec((tb, C), lambda i, j: (i, j),
                          memory_space=pltpu.VMEM)
    out = pl.pallas_call(
        _draw_kernel,
        grid=(B // tb, 1),
        in_specs=[spec_p, spec_u, spec_u],
        out_specs=spec_u,
        out_shape=jax.ShapeDtypeStruct((B, C), jnp.int32),
        interpret=pltpu.InterpretParams(detect_races=True),
    )(jnp.asarray(packs), jnp.asarray(u), jnp.asarray(u))
    assert (np.asarray(out) == 5).all()
