"""Pallas kernel tests (interpret mode on CPU; compiled path runs on TPU)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from puresound_tpu.nnet.skim import SkiM

KEY = jax.random.PRNGKey(0)


def _model():
    return SkiM(input_size=16, hidden_size=16, output_size=16, n_blocks=3,
                seg_size=8, seg_overlap=False, causal=True, embed_dim=8,
                embed_norm=True, embed_fusion="FiLM",
                block_with_embed=(1, 0, 1))


def test_fused_streaming_matches_reference_path(rng):
    """step_frames_fused == step_frames over several chunks incl. segment
    boundaries (interpret mode)."""
    m = _model()
    B, C = 8, 16
    T = 8 * 4  # 4 segments
    x = jnp.asarray(rng.standard_normal((B, 16, T)).astype(np.float32))
    e = jnp.asarray(rng.standard_normal((B, 8)).astype(np.float32))
    p = m.init(KEY, x, e)

    frames = jnp.swapaxes(x, 1, 2)  # [B, T, C]
    F = 4  # chunk frames; seg_size 8 -> boundary every 2 chunks

    s_ref = m.apply(p, B, method=SkiM.init_state)
    s_fused = m.apply(p, B, method=SkiM.init_state)
    for k in range(T // F):
        chunk = frames[:, k * F:(k + 1) * F, :]
        y_ref, s_ref = m.apply(p, chunk, e, s_ref, method=SkiM.step_frames)
        y_fused, s_fused = m.apply(p, chunk, e, s_fused, b_tile=8,
                                   interpret=True,
                                   method=SkiM.step_frames_fused)
        np.testing.assert_allclose(np.asarray(y_fused), np.asarray(y_ref),
                                   atol=2e-5, rtol=1e-4,
                                   err_msg=f"chunk {k}")
    # states agree too
    for a, b in zip(jax.tree_util.tree_leaves(s_ref),
                    jax.tree_util.tree_leaves(s_fused)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=2e-5)


def test_fused_streaming_rejects_misaligned_chunk(rng):
    m = _model()
    x = jnp.zeros((8, 16, 24))
    e = jnp.zeros((8, 8))
    p = m.init(KEY, x, e)
    state = m.apply(p, 8, method=SkiM.init_state)
    with pytest.raises(AssertionError):
        m.apply(p, jnp.zeros((8, 3, 16)), e, state, b_tile=8, interpret=True,
                method=SkiM.step_frames_fused)
