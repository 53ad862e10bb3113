"""AnchorColorProb: the flagship DISCO colorization model, composed TPU-first.

Capability parity with /root/reference/models/model.py:32-199. One flax module
whose apply() traces to a single XLA graph per (test_mode, sampled_T) variant:

  frozen SpixelSeg -> 9-way affinity
  ColorProbNet    -> 64-ch pixel features
  poolfeat(cat(feats, gt_colors)) -> 256 tokens + GT superpixel colors
  wildpath (6-layer post-norm encoder) -> pal_logit (313-way per token)
  anchor generation (k-means over enc features | GT colors | random)
  hintpath (6-layer encoder over [src, mask*hint, mask]) -> ref_logit
  upfeat + HourGlass2 -> full-res ab (enhanced)

Randomness (k-means init, random anchors, dropout) comes from flax rng
collections ('anchor', 'dropout'), threaded from the CLI seed.

Reference bugs intentionally NOT replicated (SURVEY.md section 7):
  * model.py:177 ``spix_color`` NameError on the hint2regress training path —
    we use the defined GT spix colors.
  * model.py:58 ``n_pos_y = 16 // sp_size`` latent bug — we derive the learned
    position table from the actual token-grid size.
"""

from __future__ import annotations

from typing import Any, Optional

import jax
import jax.numpy as jnp
from flax import linen as nn

from ..ops import colorlabel as cl
from ..ops import superpixel as sp
from . import anchor
from .colorprobnet import ColorProbNet
from .hourglass import HourGlass2
from . import spixelnet_s2d
from .position import PositionEmbeddingLearned, sine_position_encoding
from .spixelnet import SpixelSeg
from .transformer import TransformerEncoder


class AnchorColorProb(nn.Module):
    """See module docstring. All shape-affecting flags are static fields."""

    sp_size: int = 16
    d_model: int = 64
    n_vocab: int = 313
    use_dense_pos: bool = True
    spix_pos: bool = False
    learning_pos: bool = False
    n_clusters: int = 8
    random_hint: bool = False
    hint2regress: bool = False
    enhanced: bool = True
    use_mask: bool = False
    n_enc_layers: int = 6
    d_mlp: int = 256  # transformer feedforward dim (reference hardcodes 4*d_model)
    nhead: int = 8
    dropout: float = 0.1
    sn_folded: bool = False
    compute_dtype: Any = jnp.float32  # bf16 runs the conv nets in bfloat16
    fast_seg: bool = False  # space-to-depth segnet stages (weight-exact; TPU inference)

    @nn.compact
    def __call__(
        self,
        input_grays: jnp.ndarray,
        input_colors: jnp.ndarray,
        test_mode: bool = True,
        sampled_T: int = 0,
        train: bool = False,
        hint_mask_override: Optional[jnp.ndarray] = None,
        anchor_colors_override: Optional[jnp.ndarray] = None,
    ):
        """Forward pass.

        Args:
          input_grays: (N, H, W, 1) normalized L.
          input_colors: (N, H, W, 2) normalized ab (GT; ignored at test time
            unless sampled_T < 0 selects GT anchors).
          test_mode: static; False = training semantics (GT-color anchors).
          sampled_T: static; <0 GT anchor colors, 0 deterministic top-1,
            >0 diverse (batch tiled x3 with T=0,1,2).
          train: static; enables dropout/BN-batch-stats/spectral-norm updates
            on the trainable submodules (segnet stays frozen in eval mode).
          hint_mask_override: optional (N, h, w, 1) binary mask replacing the
            generated anchor locations — the interactive-editing affordance of
            the reference's io_user_control (basic.py:50-74, model.py:163-164).
          anchor_colors_override: optional (N, h, w, 2) normalized ab replacing
            the sampled anchor colors (user-provided hints).

        Returns dict with pal_logit (N,h,w,313), ref_logit (N*,h,w,313|2),
        pred_colors (N*,H,W,2) or None, affinity_map, spix_colors, hint_mask.
        """
        n, h, w, _ = input_grays.shape
        spn = self.sp_size
        hc, wc = h // spn, w // spn
        d = self.d_model
        cdt = self.compute_dtype
        grays_c = input_grays.astype(cdt)

        # frozen superpixel net: always eval-mode, gradients cut (model.py:78-87).
        # The affinity stays in compute dtype: forcing f32 here cost a ~2 ms
        # full-res convert + doubled the segnet-tail write on the bf16 TPU path
        # (trace-measured); the pool einsum promotes to f32 internally anyway.
        seg = SpixelSeg(batch_norm=True, train=False, name="segnet")
        if self.fast_seg:
            # materialize the (input-size-independent) segnet params with a
            # tiny dummy call, then run the space-to-depth forward — same
            # parameters, lane-efficient layout (models/spixelnet_s2d.py);
            # XLA dead-code-eliminates the dummy compute
            _ = seg(jnp.zeros((1, 32, 32, 1), cdt))
            affinity_map = spixelnet_s2d.apply_s2d(seg.variables, grays_c)
        else:
            affinity_map = seg(grays_c)
        affinity_map = jax.lax.stop_gradient(affinity_map)
        # precise pooling (f32 operands) when computing in f32 — the exact
        # reference numerics used by every parity test — and always when
        # test_mode=False: training/validation derive GT token labels from the
        # pooled colors, and those should not pick up bf16 quantization. At
        # test time the GT labels are unused (sampled anchors feed the
        # hintpath), so the bf16 path pools with bf16 operands + f32
        # accumulation, halving the 6-D blocked-relayout traffic (the dominant
        # pool cost, see ops/superpixel.py).
        # [A/B 2026-08-17, v5e, batch-32 bf16 train step] splitting the
        # training pool (bf16 64-ch feature pool + separate exact f32 color
        # pool for the GT labels) was REFUTED: 293.9 ms/step vs 286.4 joint-f32
        # — the f32 blocking of the full-res 9-ch affinity is the dominant
        # pool cost and the split duplicates it (bf16 copy for feats + f32
        # copy for colors), losing more than the 64-ch bf16 feat pool saves.
        precise = jnp.dtype(cdt) == jnp.dtype(jnp.float32) or not test_mode
        pred_feats = ColorProbNet(
            out_channels=d, train=train, sn_folded=self.sn_folded, name="repnet"
        )(grays_c)
        if precise:
            pred_feats = pred_feats.astype(jnp.float32)

        if self.spix_pos:
            # full-resolution (x, y)-aware positions pooled with the features
            full_pos = sine_position_encoding(h, w, d // 2, dtype=pred_feats.dtype)
            full_pos = jnp.broadcast_to(full_pos[None], (n, h, w, d))
            proxy = jnp.concatenate(
                [pred_feats, input_colors.astype(pred_feats.dtype), full_pos], axis=-1
            )
            pooled, _, spixel_sizes = sp.pool_and_sizes(
                proxy, affinity_map, spn, spn, precise=precise
            )
            pooled = pooled.astype(jnp.float32)
            feat_tokens = pooled[..., :d]
            spix_colors = pooled[..., d : d + 2]
            pos_feats = pooled[..., d + 2 :]
        else:
            proxy = jnp.concatenate(
                [pred_feats, input_colors.astype(pred_feats.dtype)], axis=-1
            )
            pooled, _, spixel_sizes = sp.pool_and_sizes(
                proxy, affinity_map, spn, spn, precise=precise
            )
            pooled = pooled.astype(jnp.float32)
            feat_tokens = pooled[..., :d]
            spix_colors = pooled[..., d:]
            if self.learning_pos:
                pos_feats = PositionEmbeddingLearned(wc, hc, d // 2, name="pos_enc")(hc, wc)
                pos_feats = jnp.broadcast_to(pos_feats[None], (n, hc, wc, d)).astype(
                    feat_tokens.dtype
                )
            else:
                pos_feats = sine_position_encoding(hc, wc, d // 2, dtype=feat_tokens.dtype)
                pos_feats = jnp.broadcast_to(pos_feats[None], (n, hc, wc, d))

        token_labels = cl.nearest_bin_index(spix_colors)  # (N, hc, wc)

        if self.use_mask:
            empty = spixel_sizes < (25.0 / (spn * spn))
            src_pad_mask = empty.reshape(n, hc * wc)
        else:
            src_pad_mask = None

        t = hc * wc
        src_seq = feat_tokens.reshape(n, t, d)
        pos_seq = pos_feats.reshape(n, t, d)

        enc_out, _ = TransformerEncoder(
            self.n_enc_layers,
            d,
            self.nhead,
            self.d_mlp,
            self.dropout,
            self.use_dense_pos,
            name="wildpath",
        )(src_seq, pos_seq, src_pad_mask, deterministic=not train)
        pal_logit = nn.Dense(self.n_vocab, use_bias=False, name="mid_word_prj")(enc_out)
        pal_logit = pal_logit.reshape(n, hc, wc, self.n_vocab)

        sampled_token_labels = None
        if test_mode:
            color_feat = enc_out.reshape(n, hc, wc, d)
            if hint_mask_override is not None:
                hint_mask = hint_mask_override
                cluster_mask = jnp.zeros((n, hc, wc, self.n_clusters), jnp.float32)
            elif self.random_hint:
                hint_mask, cluster_mask = anchor.random_hint_mask(
                    self.make_rng("anchor"), n, hc, wc, self.n_clusters
                )
            else:
                hint_mask, cluster_mask = anchor.clustering_hint_mask(
                    self.make_rng("anchor"), color_feat, self.n_clusters, spixel_sizes
                )
            pred_prob = jax.nn.softmax(pal_logit.astype(jnp.float32), axis=-1)
            if sampled_T < 0:
                sampled_spix_colors = spix_colors  # GT anchors
            elif sampled_T > 0:
                # diverse: three samplings tiled into the batch (model.py:148-159)
                tops = [anchor.sample_anchor_colors(pred_prob, T=i) for i in (0, 1, 2)]
                sampled_spix_colors = jnp.concatenate(tops, axis=0)
                n = 3 * n
                tile = lambda x: jnp.concatenate([x, x, x], axis=0)
                input_grays = tile(input_grays)
                hint_mask = tile(hint_mask)
                affinity_map = tile(affinity_map)
                src_seq = tile(src_seq)
                pos_seq = tile(pos_seq)
                if src_pad_mask is not None:
                    src_pad_mask = tile(src_pad_mask)
            else:
                sampled_spix_colors = anchor.sample_anchor_colors(pred_prob, T=sampled_T)
            if anchor_colors_override is not None:
                sampled_spix_colors = anchor_colors_override
            sampled_token_labels = cl.nearest_bin_index(sampled_spix_colors)
            spix_colors = sampled_spix_colors  # anchor visualization (model.py:168)
        else:
            # training: anchors from k-means over GT superpixel colors, no grad
            hint_mask, cluster_mask = anchor.clustering_hint_mask(
                self.make_rng("anchor"),
                jax.lax.stop_gradient(spix_colors),
                self.n_clusters,
                spixel_sizes,
            )
            hint_mask = jax.lax.stop_gradient(hint_mask)

        mask_seq = hint_mask.reshape(n, t, 1)
        if self.hint2regress:
            # test mode: spix_colors was reassigned to the sampled anchors above
            # (the intent of reference model.py:177, whose train branch is the
            # `spix_color` NameError typo — not replicated)
            gt_seq = spix_colors.reshape(n, t, 2)
            hint_in = jnp.concatenate([src_seq, mask_seq * gt_seq, mask_seq], axis=-1)
        else:
            labels = sampled_token_labels if test_mode else token_labels
            label_seq = jax.nn.one_hot(labels.reshape(n, t), self.n_vocab, dtype=src_seq.dtype)
            hint_in = jnp.concatenate([src_seq, mask_seq * label_seq, mask_seq], axis=-1)
        hint_seq = nn.Dense(d, use_bias=False, name="trg_word_emb")(hint_in)
        dec_out, _ = TransformerEncoder(
            self.n_enc_layers,
            d,
            self.nhead,
            self.d_mlp,
            self.dropout,
            self.use_dense_pos,
            name="hintpath",
        )(hint_seq, pos_seq, src_pad_mask, deterministic=not train)
        ct = 2 if self.hint2regress else self.n_vocab
        ref_logit = nn.Dense(ct, use_bias=False, name="trg_word_prj")(dec_out)
        ref_logit = ref_logit.reshape(n, hc, wc, ct)

        pred_colors = None
        if self.enhanced:
            proc_feats = dec_out.reshape(n, hc, wc, d).astype(cdt)
            full_feats = sp.upfeat_auto(
                proc_feats, affinity_map, spn, spn, precise=precise
            )
            enh_in = jnp.concatenate([input_grays.astype(cdt), full_feats], axis=-1)
            pred_colors = HourGlass2(
                out_channels=2,
                res_num=3,
                use_norm=True,
                train=train,
                sn_folded=self.sn_folded,
                name="enhanceNet",
            )(enh_in)
            pred_colors = jnp.tanh(pred_colors.astype(jnp.float32))

        return {
            "pal_logit": pal_logit,
            "ref_logit": ref_logit,
            "pred_colors": pred_colors,
            "affinity_map": affinity_map,
            "spix_colors": spix_colors,
            "hint_mask": hint_mask,
            "token_labels": token_labels,
            "spixel_sizes": spixel_sizes,
        }


def xavier_reinit_params(key: jax.Array, params, min_ndim: int = 2):
    """Re-initialize every >=2-dim parameter with xavier-uniform.

    Mirrors the reference's blanket ``_reset_parameters`` (model.py:73-76),
    which overrides each submodule's own init. Apply after ``module.init``
    when training from scratch; the frozen segnet weights are overwritten by
    the pretrained checkpoint afterwards, as in the reference.
    """
    leaves, treedef = jax.tree_util.tree_flatten(params)
    keys = jax.random.split(key, len(leaves))
    init = nn.initializers.xavier_uniform()
    new_leaves = []
    for k, leaf in zip(keys, leaves):
        if hasattr(leaf, "ndim") and leaf.ndim >= min_ndim:
            # dense (I, O) and conv (H, W, I, O) kernels alike: flax
            # xavier_uniform computes fan_in/out over the flattened matrix,
            # reproducing torch's nn.init.xavier_uniform_
            new_leaves.append(init(k, leaf.shape, leaf.dtype))
        else:
            new_leaves.append(leaf)
    return jax.tree_util.tree_unflatten(treedef, new_leaves)
