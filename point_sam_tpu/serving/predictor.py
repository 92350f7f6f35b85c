"""Stateful interactive predictor: encode once, decode per click.

First-class implementation of the cached-encoder API the reference demo
expects but does not ship (``sam.set_pointcloud(xyz, rgb)`` +
``sam.predict_masks(prompt_points, prompt_labels, prompt_mask, multimask)``
returning ``(mask, scores, logits)`` — demo/app.py:199-203 calls it from the
companion point-sam-demo package; SURVEY.md §3.3 flags it as a required
artifact).

TPU-first design:
- **Bucketed compilation**: point count N is padded up to a size bucket and
  prompt count P to a power of two, so each (N-bucket, G, K, P-bucket,
  has_mask, multimask) combination compiles exactly once and every
  subsequent click hits a cached executable. This replaces the reference's
  per-scene grouper reconfiguration (eval_kitti.py:350-362).
- **Geometry cache**: FPS centers, kNN indices and 3-NN interpolation
  weights are computed once per ``set_pointcloud`` and reused by every
  decode (the reference recomputes grouping inside each forward).
- Custom ``group_number`` / ``group_size`` per cloud, like the reference
  README recommends for >100k-point scenes (README.md:69).
"""

from __future__ import annotations

from functools import partial

import numpy as np

DEFAULT_POINT_BUCKETS = (2048, 8192, 32768, 131072, 524288)


def _next_bucket(n: int, buckets) -> int:
    for b in buckets:
        if n <= b:
            return b
    return int(-(-n // buckets[-1]) * buckets[-1])


def _next_pow2(n: int, lo: int = 1) -> int:
    p = lo
    while p < n:
        p *= 2
    return p


def _freeze(x):
    return tuple(x) if isinstance(x, (list, tuple)) else x


class Predictor:
    """Interactive single-cloud predictor over a PointCloudSAM model."""

    def __init__(
        self,
        model,
        variables,
        *,
        point_buckets=DEFAULT_POINT_BUCKETS,
        max_prompts: int = 64,
    ):
        import jax.numpy as jnp

        from ..models import cast_params_for_inference, for_inference

        self.model = for_inference(model)
        # Pre-cast matmul kernels to the compute dtype: bit-identical (flax
        # casts them per dispatch anyway) and removes ~2 ms/encode of
        # fp32->bf16 weight-convert HBM traffic at ViT-L (models/pc_sam.py).
        if self.model.dtype == jnp.bfloat16:
            variables = cast_params_for_inference(variables)
        self.variables = variables
        self.point_buckets = tuple(point_buckets)
        self.max_prompts = max_prompts
        self._encode_cache = {}
        self._decode_cache = {}
        self._state = None

    # ------------------------------------------------------------ encode
    def set_pointcloud(
        self,
        xyz: np.ndarray,
        rgb: np.ndarray,
        *,
        group_number: int | None = None,
        group_size: int | None = None,
        normalize: bool = False,
    ) -> None:
        """Tokenize + encode a point cloud and cache everything per-cloud.

        Args:
            xyz: [N, 3] float coordinates (normalized to the unit sphere
                unless ``normalize=True``).
            rgb: [N, 3] float colors (any consistent scale; the demo uses
                0..1).
            group_number/group_size: tokenizer override (reference README
                recommends 2048/256 for >100k points, README.md:69). Default
                follows the reference eval rule (eval_kitti.py:350-362):
                N > 30000 -> 2048/256, else the model's training config.
        """
        import jax.numpy as jnp

        xyz = np.asarray(xyz, np.float32)
        rgb = np.asarray(rgb, np.float32)
        n = len(xyz)
        self._shift = np.zeros(3, np.float32)
        self._scale = 1.0
        if normalize:
            self._shift = xyz.mean(0)
            xyz = xyz - self._shift
            self._scale = float(np.linalg.norm(xyz, axis=1).max()) or 1.0
            xyz = xyz / self._scale

        tok = getattr(self.model.cfg, "tokenizer", None)
        default_g = tok.num_patches if tok is not None else \
            self.model.cfg.num_patches
        default_k = getattr(tok, "patch_size", 64) if tok is not None else 64
        if isinstance(default_g, (tuple, list)):
            # Hier variant: two-level override (reference README blesses
            # per-scene G/K reconfiguration, README.md:69). A scalar override
            # adjusts level 1 (the cloud-facing level); a 2-tuple overrides
            # both levels.
            def _two_level(value, default):
                if value is None:
                    return tuple(default)
                if isinstance(value, (tuple, list)):
                    assert len(value) == 2, value
                    return tuple(int(v) for v in value)
                return (int(value), int(default[1]))

            group_number = _two_level(group_number, default_g)
            group_size = _two_level(group_size, default_k)
        elif group_number is None:
            if n > 30000:
                group_number, group_size = 2048, 256
            else:
                group_number = min(default_g, _next_pow2(n, 64))
                group_size = group_size or default_k
        if not isinstance(group_number, (tuple, list)):
            group_size = min(group_size or default_k, n)

        n_pad = _next_bucket(n, self.point_buckets)
        coords = np.zeros((1, n_pad, 3), np.float32)
        coords[0, :n] = xyz
        feats = np.zeros((1, n_pad, rgb.shape[-1]), np.float32)
        feats[0, :n] = rgb
        valid = np.zeros((1, n_pad), bool)
        valid[0, :n] = True

        key = (n_pad, _freeze(group_number), group_size)
        if key not in self._encode_cache:
            self._encode_cache[key] = self._build_encode(
                n_pad, group_number, group_size
            )
        emb, pc_pe, extras, geom = self._encode_cache[key](
            self.variables, jnp.asarray(coords), jnp.asarray(feats),
            jnp.asarray(valid),
        )
        self._state = dict(
            n=n, n_pad=n_pad, coords=jnp.asarray(coords),
            valid=jnp.asarray(valid), emb=emb, pc_pe=pc_pe, extras=extras,
            geom=geom, group=(_freeze(group_number), group_size),
        )

    def _build_encode(self, n_pad, g, k):
        import jax

        from ..models.tokenizer import HierTokenizerConfig, TokenizerConfig

        base_tok = getattr(self.model.cfg, "tokenizer", None)
        if isinstance(g, (tuple, list)):
            tok = HierTokenizerConfig(
                num_patches=tuple(g),
                patch_size=tuple(k),
                radius=getattr(base_tok, "radius", None),
            )
        else:
            tok = TokenizerConfig(
                num_patches=g, patch_size=k,
                radius=getattr(base_tok, "radius", None),
                centralize_features=getattr(
                    base_tok, "centralize_features", False),
            )

        from ..models.pc_sam import PointCloudSAM
        from ..models.pc_sam_variants import PointCloudSAMHier, PointCloudSAMNN
        from ..models.prompt_encoder import mask_group_rel_xyz, mask_nbr_dist

        @jax.jit
        def encode(variables, coords, feats, valid):
            geom = self.model.make_geometry(
                coords, point_valid=valid, tokenizer=tok
            )
            # Pre-compute the click-invariant half of the mask-prompt
            # grouping once per cloud; every subsequent predict_masks with
            # a prompt_mask then gathers only the mask-dependent channels
            # (see prompt_encoder.mask_group_rel_xyz / mask_nbr_dist).
            geom = dict(geom)
            if type(self.model) is PointCloudSAM:
                # Flagship MaskEncoder is built without a radius.
                geom["mask_rel_xyz"] = mask_group_rel_xyz(
                    coords, geom["centers"], geom["knn_idx"]
                )
            elif type(self.model) is PointCloudSAMNN:
                geom["mask_nbr_dist"] = mask_nbr_dist(
                    coords, geom["centers"], geom["nn_idx"]
                )
            elif type(self.model) is PointCloudSAMHier:
                r = getattr(tok, "radius", None)
                geom["mask_rel_xyz1"] = mask_group_rel_xyz(
                    coords, geom["centers1"], geom["knn_idx1"],
                    radius=r[0] if r else None,
                )
                geom["mask_rel_xyz2"] = mask_group_rel_xyz(
                    geom["centers1"], geom["centers2"], geom["knn_idx2"],
                    radius=r[1] if r else None,
                )
            out = self.model.apply(
                variables, coords, feats, geom, method=self.model.encode
            )
            emb, pe, *extras = out
            return emb, pe, tuple(extras), geom

        return encode

    # ------------------------------------------------------------ decode
    def predict_masks(
        self,
        prompt_points: np.ndarray,
        prompt_labels: np.ndarray,
        prompt_mask: np.ndarray | None = None,
        multimask_output: bool = True,
    ):
        """One decoder pass against the cached encoding.

        Args:
            prompt_points: [P, 3] (or [1, P, 3]) click coordinates in the
                cloud's normalized frame.
            prompt_labels: [P] bool/int, 1 = positive.
            prompt_mask: optional [N] (or [1, N]) mask logits from the
                previous call.
            multimask_output: 3 candidate masks (first click) vs 1.

        Returns:
            (masks [1, C, N] bool, iou_scores [1, C], logits [1, C, N]) —
            the demo contract (demo/app.py:200-203).
        """
        import jax.numpy as jnp

        if self._state is None:
            raise RuntimeError("call set_pointcloud first")
        st = self._state
        pts = np.asarray(prompt_points, np.float32).reshape(-1, 3)
        labs = np.asarray(prompt_labels).reshape(-1).astype(bool)
        p = len(pts)
        if p == 0:
            raise ValueError("need at least one prompt point")
        if p > self.max_prompts:
            raise ValueError(f"too many prompts ({p} > {self.max_prompts})")
        p_pad = _next_pow2(p)

        pc = np.zeros((1, p_pad, 3), np.float32)
        # shift=0/scale=1 when set_pointcloud didn't normalize, so applying
        # unconditionally is a no-op in that case (and correct otherwise).
        pc[0, :p] = (pts - self._shift) / self._scale
        pl = np.zeros((1, p_pad), bool)
        pl[0, :p] = labs
        pv = np.zeros((1, p_pad), bool)
        pv[0, :p] = True

        has_mask = prompt_mask is not None
        if has_mask:
            pm = np.zeros((1, st["n_pad"]), np.float32)
            pm[0, : st["n"]] = np.asarray(prompt_mask, np.float32).reshape(-1)[
                : st["n"]
            ]
            pm = jnp.asarray(pm)
        else:
            pm = None

        key = (st["n_pad"], st["group"], p_pad, has_mask, multimask_output)
        if key not in self._decode_cache:
            self._decode_cache[key] = self._build_decode(
                has_mask, multimask_output
            )
        masks_logits, iou = self._decode_cache[key](
            self.variables, st["emb"], st["pc_pe"], st["coords"], st["geom"],
            st["extras"], jnp.asarray(pc), jnp.asarray(pl), jnp.asarray(pv),
            pm,
        )
        logits = np.asarray(masks_logits)[:, :, : st["n"]]
        scores = np.asarray(iou)
        return logits > 0, scores, logits

    def _build_decode(self, has_mask, multimask_output):
        import jax

        @jax.jit
        def decode(variables, emb, pc_pe, coords, geom, extras, pc, pl, pv,
                   pm):
            # extras: () for knn/voronoi; (embeddings_l1,) for hier, whose
            # decode takes them right after geom.
            return self.model.apply(
                variables, emb, pc_pe, coords, geom, *extras, pc, pl,
                pm if has_mask else None,
                prompt_valid=pv, multimask_output=multimask_output,
                method=self.model.decode,
            )

        return decode

    # ----------------------------------------------------------- helpers
    def click(self, prompt_points, prompt_labels, prompt_mask=None):
        """Demo-style best-mask step: predict, pick argmax-score mask, return
        (best_mask [N] bool, best_logits [N]) (demo/app.py:199-205)."""
        multimask = prompt_mask is None
        masks, scores, logits = self.predict_masks(
            prompt_points, prompt_labels, prompt_mask, multimask
        )
        best = int(np.argmax(scores[0]))
        return masks[0, best], logits[0, best]
