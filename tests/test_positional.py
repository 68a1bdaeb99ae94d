"""Positional embedding tests — golden values mirror the reference's
make_positions test (/root/reference/tell/modules/token_embedders/tests/
test_positional.py)."""
import jax.numpy as jnp
import numpy as np

from tell_tpu.ops import make_positions, sinusoidal_embed, sinusoidal_table


def test_make_positions_right_pad():
    pad = 1
    ids = jnp.array([
        [9, 9, 9, 9, 1, 1],
        [9, 9, 1, 1, 1, 1],
    ])
    pos = make_positions(ids, pad)
    np.testing.assert_array_equal(
        np.asarray(pos),
        [[2, 3, 4, 5, 1, 1],
         [2, 3, 1, 1, 1, 1]])


def test_table_structure():
    tab = np.asarray(sinusoidal_table(16, 8, padding_idx=1))
    np.testing.assert_allclose(tab[1], 0.0)          # pad row zeroed
    np.testing.assert_allclose(tab[0, :4], 0.0, atol=1e-7)   # sin(0)=0
    np.testing.assert_allclose(tab[0, 4:], 1.0, atol=1e-7)   # cos(0)=1
    # position 2, first channel: sin(2 * 1.0)
    np.testing.assert_allclose(tab[2, 0], np.sin(2.0), atol=1e-6)
    np.testing.assert_allclose(tab[2, 4], np.cos(2.0), atol=1e-6)


def test_embed_with_start_pos():
    pad = 1
    tab = sinusoidal_table(64, 8, padding_idx=pad)
    ids = jnp.array([[5, 7, 1]])
    e0 = sinusoidal_embed(tab, ids, pad)
    np.testing.assert_allclose(np.asarray(e0[0, 0]), np.asarray(tab[2]))
    np.testing.assert_allclose(np.asarray(e0[0, 2]), 0.0)  # pad -> zero row
    # decoding step 5 (five tokens already emitted): position shifts by 5
    e5 = sinusoidal_embed(tab, jnp.array([[5]]), pad, start_pos=5)
    np.testing.assert_allclose(np.asarray(e5[0, 0]), np.asarray(tab[7]))
