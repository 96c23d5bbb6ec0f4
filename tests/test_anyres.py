"""AnyRes model path: device merge parity vs the reference algorithm
(llava/model/llava_arch.py:317-408 spatial_unpad branch + unpad_image
:127-157, re-implemented here in numpy from study), layout expansion,
and end-to-end VQA generate."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from streamvln_tpu.configs import tiny_streamvln
from streamvln_tpu.models import anyres, streamvln
from streamvln_tpu.utils.constants import IMAGE_TOKEN_INDEX


def _reference_merge(feats, newline, grid_hw, pps, original_size):
    """Numpy transcription of the reference's spatial_unpad merge
    semantics (view/permute/flatten at llava_arch.py:371-400, unpad at
    :138-157): base thumbnail ++ unpadded spatial grid with a newline
    column appended to every row."""
    nph, npw = grid_hw
    D = feats.shape[-1]
    base = feats[0]
    x = feats[1:].reshape(nph, npw, pps, pps, D)
    x = x.transpose(4, 0, 2, 1, 3).reshape(D, nph * pps, npw * pps)
    ow, oh = original_size
    H, W = x.shape[1:]
    if ow / oh > W / H:
        new_h = int(oh * (W / ow))
        pad = (H - new_h) // 2
        x = x[:, pad: H - pad, :]
    else:
        new_w = int(ow * (H / oh))
        pad = (W - new_w) // 2
        x = x[:, :, pad: W - pad]
    nl = np.tile(newline[:, None, None], (1, x.shape[1], 1))
    x = np.concatenate([x, nl], axis=2)
    x = x.reshape(D, -1).T
    return np.concatenate([base, x], axis=0)


@pytest.mark.parametrize("grid_hw,osize", [
    ((1, 2), (800, 340)),    # wide image
    ((2, 1), (340, 800)),    # tall image
    ((2, 2), (500, 460)),    # near-square
    ((3, 1), (300, 1100)),
])
def test_merge_matches_reference_algorithm(grid_hw, osize):
    pps = 6
    nph, npw = grid_hw
    D = 16
    rng = np.random.default_rng(0)
    feats = rng.standard_normal(
        (nph * npw + 1, pps * pps, D)).astype(np.float32)
    newline = rng.standard_normal(D).astype(np.float32)

    want = _reference_merge(feats, newline, grid_hw, pps, osize)
    got = np.asarray(anyres.merge_anyres_features(
        jnp.asarray(feats), jnp.asarray(newline), grid_hw, pps, osize))
    assert got.shape == want.shape
    np.testing.assert_allclose(got, want, rtol=0, atol=0)
    # host-side count formula agrees with the produced shape
    n = pps * pps + (want.shape[0] - pps * pps)
    top, h, left, w = anyres.unpad_bounds(grid_hw, pps, osize)
    assert want.shape[0] == pps * pps + h * (w + 1) == n


def test_token_count_and_layout_expansion():
    cfg = tiny_streamvln()
    pins = ((cfg.vision.image_size, 2 * cfg.vision.image_size),
            (2 * cfg.vision.image_size, cfg.vision.image_size))
    osize = (200, 90)      # wide -> 2x1 tile grid (w x h pinpoint)
    n = anyres.anyres_token_count(osize, pins, cfg.vision.image_size,
                                  cfg.vision.patches_per_side)
    assert n > cfg.vision.patches_per_side ** 2
    ids = np.asarray([7, IMAGE_TOKEN_INDEX, 5, 6], np.int32)
    layout = streamvln.build_splice_layout(ids, cfg,
                                           image_token_counts=[n])
    assert layout.length == 3 + n
    assert int(layout.is_vision.sum()) == n
    # vision indices are 0..n-1 in order
    np.testing.assert_array_equal(
        layout.vision_index[layout.is_vision], np.arange(n))


@pytest.mark.slow
def test_generate_anyres_end_to_end():
    cfg = tiny_streamvln()
    params = streamvln.init(jax.random.PRNGKey(0), cfg)
    S = cfg.vision.image_size
    pins = ((S, 2 * S), (2 * S, S), (2 * S, 2 * S))
    rng = np.random.default_rng(1)
    image = rng.integers(0, 255, (60, 130, 3), dtype=np.uint8)

    feats = anyres.encode_anyres(params, cfg, image, pins)
    n = anyres.anyres_token_count(
        (130, 60), pins, S, cfg.vision.patches_per_side)
    assert feats.shape == (n, cfg.llm.hidden_size)

    from streamvln_tpu.data import chatml
    from streamvln_tpu.data.tokenizer import ByteTokenizer
    tok = ByteTokenizer()
    ids, _ = chatml.tokenize_dialogue(
        tok, [("user", "<image> what do you see?")], add_system=True,
        with_labels=False)
    ids = np.concatenate([ids, np.asarray(
        chatml.generation_prompt(tok), np.int32)])
    out = anyres.generate_anyres(params, cfg, tok, image, ids,
                                 max_new=4, stop_ids=(tok.im_end_id,),
                                 grid_pinpoints=pins)
    assert 1 <= len(out) <= 4
    assert all(isinstance(t, int) for t in out)
