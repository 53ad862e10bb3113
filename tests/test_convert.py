"""The strongest parity test: random reference weights -> converter -> identical
outputs from our model on the deterministic forward path.

K-means anchor locations are RNG-backend-dependent (documented), so the
reference's anchorGen is pinned to a fixed hint mask and the same mask is fed
to our model via hint_mask_override; everything else (segnet, repnet, pooling,
both transformer paths, sampling T=0, unpooling, HourGlass enhancement) runs
end-to-end through converted weights.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from disentangledcolorization_tpu.models import AnchorColorProb
from disentangledcolorization_tpu.tools import convert_torch as cvt


@pytest.fixture(scope="module")
def ref_pair(reference_modules):
    torch = reference_modules["torch"]
    model_mod = reference_modules["model"]
    torch.manual_seed(0)
    m = model_mod.AnchorColorProb(
        inChannel=1, outChannel=313, sp_size=16, d_model=64, use_dense_pos=True,
        n_clusters=4, random_hint=False, hint2regress=False, enhanced=True, rank=0,
    )
    m.eval()
    sd = {k: v.detach().cpu().numpy() for k, v in m.state_dict().items()}
    variables = cvt.convert_disco_state_dict(sd, enhanced=True, sn_folded=True)
    ours = AnchorColorProb(sp_size=16, n_clusters=4, enhanced=True, sn_folded=True)
    return reference_modules, m, ours, variables


def _np_inputs(n=1, h=64, w=64, seed=0):
    rng = np.random.default_rng(seed)
    grays = rng.uniform(-1, 1, size=(n, 1, h, w)).astype(np.float32)
    colors = rng.uniform(-0.5, 0.5, size=(n, 2, h, w)).astype(np.float32)
    return grays, colors


def test_converted_weights_full_forward_parity(ref_pair):
    refs, ref_model, ours, variables = ref_pair
    torch = refs["torch"]
    grays, colors = _np_inputs()
    n, _, h, w = grays.shape
    hc, wc = h // 16, w // 16

    # pin the reference anchor generator to a fixed mask
    fixed_mask = np.zeros((n, 1, hc, wc), np.float32)
    fixed_mask[:, :, 1, 1] = 1.0
    fixed_mask[:, :, 2, 3] = 1.0
    fixed_mask[:, :, 3, 0] = 1.0
    fixed_mask[:, :, 0, 2] = 1.0

    class PinnedAnchorGen:
        def __init__(self, orig):
            self._sample_anchor_colors = orig._sample_anchor_colors

        def __call__(self, data_tensors, n_anchors, spixel_sizes, use_sklearn_kmeans=False):
            return torch.from_numpy(fixed_mask), torch.zeros(n, 4, hc, wc)

    ref_model.anchorGen = PinnedAnchorGen(ref_model.anchorGen)
    with torch.no_grad():
        pal, ref_logit, pred_colors, affinity, spix_colors, hint_mask = ref_model(
            torch.from_numpy(grays), torch.from_numpy(colors), True, 0
        )

    out = ours.apply(
        variables,
        jnp.asarray(grays.transpose(0, 2, 3, 1)),
        jnp.asarray(colors.transpose(0, 2, 3, 1)),
        True,
        0,
        False,
        hint_mask_override=jnp.asarray(fixed_mask.transpose(0, 2, 3, 1)),
        rngs={"anchor": jax.random.key(0)},
    )

    np.testing.assert_allclose(
        np.asarray(out["affinity_map"]).transpose(0, 3, 1, 2), affinity.numpy(), atol=2e-4
    )
    np.testing.assert_allclose(
        np.asarray(out["pal_logit"]).transpose(0, 3, 1, 2), pal.numpy(), atol=5e-3
    )
    np.testing.assert_allclose(
        np.asarray(out["ref_logit"]).transpose(0, 3, 1, 2), ref_logit.numpy(), atol=5e-3
    )
    np.testing.assert_allclose(
        np.asarray(out["pred_colors"]).transpose(0, 3, 1, 2), pred_colors.numpy(), atol=5e-3
    )


def test_converted_spixelseg_parity(ref_pair):
    refs, ref_model, _, _ = ref_pair
    torch = refs["torch"]
    from disentangledcolorization_tpu.models import SpixelSeg

    sd = {k: v.detach().cpu().numpy() for k, v in ref_model.segnet.state_dict().items()}
    variables = cvt.convert_spixelseg_state_dict(sd)
    grays, _ = _np_inputs(seed=1)
    with torch.no_grad():
        ref_prob = ref_model.segnet(torch.from_numpy(grays)).numpy()
    ours = SpixelSeg()
    prob = ours.apply(variables, jnp.asarray(grays.transpose(0, 2, 3, 1)))
    np.testing.assert_allclose(np.asarray(prob).transpose(0, 3, 1, 2), ref_prob, atol=2e-4)


def test_converted_weights_hint2regress_parity(reference_modules):
    """Same converted-weight parity for the hint2regress (ab-regression) head."""
    refs = reference_modules
    torch = refs["torch"]
    model_mod = refs["model"]
    torch.manual_seed(1)
    ref_model = model_mod.AnchorColorProb(
        inChannel=1, outChannel=313, sp_size=16, d_model=64, use_dense_pos=True,
        n_clusters=4, random_hint=False, hint2regress=True, enhanced=False, rank=0,
    )
    ref_model.eval()
    sd = {k: v.detach().cpu().numpy() for k, v in ref_model.state_dict().items()}
    variables = cvt.convert_disco_state_dict(sd, hint2regress=True, enhanced=False, sn_folded=True)
    ours = AnchorColorProb(
        sp_size=16, n_clusters=4, hint2regress=True, enhanced=False, sn_folded=True
    )

    grays, colors = _np_inputs(seed=5)
    n, _, h, w = grays.shape
    hc, wc = h // 16, w // 16
    fixed_mask = np.zeros((n, 1, hc, wc), np.float32)
    fixed_mask[:, :, 0, 0] = 1.0
    fixed_mask[:, :, 2, 2] = 1.0

    class PinnedAnchorGen:
        def __init__(self, orig):
            self._sample_anchor_colors = orig._sample_anchor_colors

        def __call__(self, data_tensors, n_anchors, spixel_sizes, use_sklearn_kmeans=False):
            return torch.from_numpy(fixed_mask), torch.zeros(n, 4, hc, wc)

    ref_model.anchorGen = PinnedAnchorGen(ref_model.anchorGen)
    with torch.no_grad():
        _, ref_logit, _, _, _, _ = ref_model(
            torch.from_numpy(grays), torch.from_numpy(colors), True, 0
        )

    out = ours.apply(
        variables,
        jnp.asarray(grays.transpose(0, 2, 3, 1)),
        jnp.asarray(colors.transpose(0, 2, 3, 1)),
        True,
        0,
        False,
        hint_mask_override=jnp.asarray(fixed_mask.transpose(0, 2, 3, 1)),
        rngs={"anchor": jax.random.key(0)},
    )
    np.testing.assert_allclose(
        np.asarray(out["ref_logit"]).transpose(0, 3, 1, 2), ref_logit.numpy(), atol=5e-3
    )
