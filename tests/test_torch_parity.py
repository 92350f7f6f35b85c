"""Numerical parity vs torch oracles (SURVEY.md §4(b)).

For each core module we build a small torch implementation with the
reference's architecture (hand-written oracles — structure from the
reference's documented semantics, not copied code), push its state dict
through our converter, and compare outputs elementwise. This validates the
converter and the module semantics *together*: a wrong LN placement, a
missing attention downsample, or a bad weight transpose all fail here.

Everything runs in fp64-free fp32 on CPU; tolerances are a few 1e-5.
"""

import numpy as np
import pytest

torch = pytest.importorskip("torch")
import torch.nn as tnn  # noqa: E402

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from point_sam_tpu.models import (  # noqa: E402
    MaskDecoder,
    PatchEncoder,
    PointCloudSAM,
    PointSAMConfig,
    TokenizerConfig,
    init_variables,
)
from point_sam_tpu.utils import convert  # noqa: E402


def t2n(t):
    return t.detach().numpy()


# ----------------------------------------------------------- torch oracles
class TorchPointNet(tnn.Module):
    """PointNet-seg patch encoder (reference common.py:477-506 semantics)."""

    def __init__(self, cin, cout, h0=128, h1=512):
        super().__init__()
        self.conv1 = tnn.Sequential(
            tnn.Linear(cin, h0), tnn.LayerNorm(h0), tnn.GELU(),
            tnn.Linear(h0, h0))
        self.conv2 = tnn.Sequential(
            tnn.Linear(h0 * 2, h1), tnn.LayerNorm(h1), tnn.GELU(),
            tnn.Linear(h1, cout))

    def forward(self, p):
        x = self.conv1(p)
        y = x.max(dim=-2, keepdim=True).values
        x = torch.cat([y.expand_as(x), x], dim=-1)
        x = self.conv2(x)
        return x.max(dim=-2).values


class TorchAttention(tnn.Module):
    """Decoder attention w/ downsampling (reference transformer.py:179-236)."""

    def __init__(self, dim, heads, downsample=1):
        super().__init__()
        self.internal = dim // downsample
        self.heads = heads
        self.q_proj = tnn.Linear(dim, self.internal)
        self.k_proj = tnn.Linear(dim, self.internal)
        self.v_proj = tnn.Linear(dim, self.internal)
        self.out_proj = tnn.Linear(self.internal, dim)

    def forward(self, q, k, v):
        def split(x):
            b, n, c = x.shape
            return x.reshape(b, n, self.heads, c // self.heads).transpose(1, 2)

        q, k, v = split(self.q_proj(q)), split(self.k_proj(k)), split(
            self.v_proj(v))
        attn = (q @ k.transpose(-1, -2)) / (q.shape[-1] ** 0.5)
        attn = torch.softmax(attn, dim=-1)
        out = attn @ v
        b, h, n, c = out.shape
        out = out.transpose(1, 2).reshape(b, n, h * c)
        return self.out_proj(out)


class TorchTwoWayBlock(tnn.Module):
    """(reference transformer.py:103-176)."""

    def __init__(self, dim, heads, mlp_dim, skip_first_pe):
        super().__init__()
        self.self_attn = TorchAttention(dim, heads)
        self.norm1 = tnn.LayerNorm(dim)
        self.cross_attn_token_to_image = TorchAttention(dim, heads, 2)
        self.norm2 = tnn.LayerNorm(dim)
        self.mlp = tnn.Sequential()
        self.mlp.lin1 = tnn.Linear(dim, mlp_dim)
        self.mlp.lin2 = tnn.Linear(mlp_dim, dim)
        self.norm3 = tnn.LayerNorm(dim)
        self.norm4 = tnn.LayerNorm(dim)
        self.cross_attn_image_to_token = TorchAttention(dim, heads, 2)
        self.skip_first_pe = skip_first_pe

    def forward(self, queries, keys, query_pe, key_pe):
        if self.skip_first_pe:
            queries = self.self_attn(queries, queries, queries)
        else:
            q = queries + query_pe
            queries = queries + self.self_attn(q, q, queries)
        queries = self.norm1(queries)
        q = queries + query_pe
        k = keys + key_pe
        queries = self.norm2(queries + self.cross_attn_token_to_image(q, k, keys))
        mlp_out = self.mlp.lin2(torch.relu(self.mlp.lin1(queries)))
        queries = self.norm3(queries + mlp_out)
        q = queries + query_pe
        k = keys + key_pe
        keys = self.norm4(keys + self.cross_attn_image_to_token(k, q, queries))
        return queries, keys


class TorchTwoWay(tnn.Module):
    def __init__(self, depth=2, dim=256, heads=8, mlp_dim=2048):
        super().__init__()
        self.layers = tnn.ModuleList(
            [TorchTwoWayBlock(dim, heads, mlp_dim, i == 0)
             for i in range(depth)]
        )
        self.final_attn_token_to_image = TorchAttention(dim, heads, 2)
        self.norm_final_attn = tnn.LayerNorm(dim)

    def forward(self, pc_embedding, pc_pe, point_embedding):
        queries, keys = point_embedding, pc_embedding
        for layer in self.layers:
            queries, keys = layer(queries, keys, point_embedding, pc_pe)
        q = queries + point_embedding
        k = keys + pc_pe
        queries = queries + self.final_attn_token_to_image(q, k, keys)
        return self.norm_final_attn(queries), keys


class TorchEvaBlock(tnn.Module):
    """EVA02 block as used (pre-norm, sep q/k/v w/ bias-free k, SwiGLU+subLN)."""

    def __init__(self, dim, heads, hidden):
        super().__init__()
        self.norm1 = tnn.LayerNorm(dim)
        self.norm2 = tnn.LayerNorm(dim)

        class Attn(tnn.Module):
            def __init__(self):
                super().__init__()
                self.q_proj = tnn.Linear(dim, dim)
                self.k_proj = tnn.Linear(dim, dim, bias=False)
                self.v_proj = tnn.Linear(dim, dim)
                self.proj = tnn.Linear(dim, dim)
                self.heads = heads

            def forward(self, x):
                b, n, c = x.shape
                hd = c // self.heads

                def split(t):
                    return t.reshape(b, n, self.heads, hd).transpose(1, 2)

                q, k, v = (split(self.q_proj(x)), split(self.k_proj(x)),
                           split(self.v_proj(x)))
                a = torch.softmax((q @ k.transpose(-1, -2)) / hd ** 0.5, -1)
                o = (a @ v).transpose(1, 2).reshape(b, n, c)
                return self.proj(o)

        class Mlp(tnn.Module):
            def __init__(self):
                super().__init__()
                self.fc1_g = tnn.Linear(dim, hidden)
                self.fc1_x = tnn.Linear(dim, hidden)
                self.norm = tnn.LayerNorm(hidden)
                self.fc2 = tnn.Linear(hidden, dim)

            def forward(self, x):
                x = tnn.functional.silu(self.fc1_g(x)) * self.fc1_x(x)
                return self.fc2(self.norm(x))

        self.attn = Attn()
        self.mlp = Mlp()

    def forward(self, x):
        x = x + self.attn(self.norm1(x))
        return x + self.mlp(self.norm2(x))


# ------------------------------------------------------------------- tests
class TestModuleParity:
    def test_patch_encoder(self, rng):
        tmod = TorchPointNet(6, 512)
        x = rng.standard_normal((2, 8, 16, 6)).astype(np.float32)
        want = t2n(tmod(torch.from_numpy(x)))

        jmod = PatchEncoder(512, (128, 512))
        variables = jmod.init(jax.random.PRNGKey(0), jnp.asarray(x))
        sd = {f"pe.{k}": v.numpy() for k, v in tmod.state_dict().items()}
        # reuse the mask-encoder pointnet mapping by prefixing accordingly
        sd = {k.replace("pe.", "mask_encoder.patch_encoder."): v
              for k, v in sd.items()}
        wrapped = {"params": {"mask_encoder": {"patch_encoder":
                                               variables["params"]}}}
        new_vars, report = convert.convert_state_dict(sd, wrapped)
        assert not report["unmapped"]
        got = np.asarray(jmod.apply(
            {"params":
             new_vars["params"]["mask_encoder"]["patch_encoder"]},
            jnp.asarray(x)))
        np.testing.assert_allclose(got, want, atol=2e-5)

    def test_two_way_transformer(self, rng):
        torch.manual_seed(0)
        tmod = TorchTwoWay(depth=2, dim=64, heads=4, mlp_dim=128)
        pc = rng.standard_normal((2, 10, 64)).astype(np.float32)
        pe = rng.standard_normal((2, 10, 64)).astype(np.float32)
        tok = rng.standard_normal((2, 5, 64)).astype(np.float32)
        wq, wk = tmod(torch.from_numpy(pc), torch.from_numpy(pe),
                      torch.from_numpy(tok))

        from point_sam_tpu.models import TwoWayTransformer

        jmod = TwoWayTransformer(depth=2, embed_dim=64, num_heads=4,
                                 mlp_dim=128)
        variables = jmod.init(jax.random.PRNGKey(0), jnp.asarray(pc),
                              jnp.asarray(pe), jnp.asarray(tok))
        sd = {f"mask_decoder.transformer.{k}": v.numpy()
              for k, v in tmod.state_dict().items()}
        wrapped = {"params": {"mask_decoder": {"transformer":
                                               variables["params"]}}}
        new_vars, report = convert.convert_state_dict(sd, wrapped)
        assert not report["unmapped"], report["unmapped"][:4]
        assert not report["unfilled"], report["unfilled"][:4]
        gq, gk = jmod.apply(
            {"params": new_vars["params"]["mask_decoder"]["transformer"]},
            jnp.asarray(pc), jnp.asarray(pe), jnp.asarray(tok))
        np.testing.assert_allclose(np.asarray(gq), t2n(wq), atol=3e-5)
        np.testing.assert_allclose(np.asarray(gk), t2n(wk), atol=3e-5)

    def test_eva_block(self, rng):
        torch.manual_seed(1)
        tmod = TorchEvaBlock(64, 4, 128)
        x = rng.standard_normal((2, 12, 64)).astype(np.float32)
        want = t2n(tmod(torch.from_numpy(x)))

        from point_sam_tpu.models.vit import EvaBlock, ViTConfig

        cfg = ViTConfig(64, 1, 4, 128)
        jmod = EvaBlock(cfg)
        variables = jmod.init(jax.random.PRNGKey(0), jnp.asarray(x))
        sd = {f"pc_encoder.transformer.blocks.0.{k}": v.numpy()
              for k, v in tmod.state_dict().items()}
        wrapped = {"params": {"pc_encoder": {"transformer": {"blocks_0":
                                                             variables["params"]}}}}
        new_vars, report = convert.convert_state_dict(sd, wrapped)
        assert not report["unmapped"], report["unmapped"][:4]
        got = np.asarray(jmod.apply(
            {"params":
             new_vars["params"]["pc_encoder"]["transformer"]["blocks_0"]},
            jnp.asarray(x)))
        np.testing.assert_allclose(got, want, atol=3e-5)

    def test_position_embedding_random(self, rng):
        """PE: sin/cos of 2*pi*(coords @ gaussian) (prompt_encoder.py:27-48)."""
        from point_sam_tpu.models import PositionEmbeddingRandom

        coords = rng.uniform(-1, 1, (5, 3)).astype(np.float32)
        mat = rng.standard_normal((3, 8)).astype(np.float32)
        jmod = PositionEmbeddingRandom(num_pos_feats=8)
        variables = jmod.init(jax.random.PRNGKey(0), jnp.asarray(coords))
        variables = {"buffers": {"gaussian_matrix": jnp.asarray(mat)}}
        got = np.asarray(jmod.apply(variables, jnp.asarray(coords)))
        ang = 2 * np.pi * (coords @ mat)
        want = np.concatenate([np.sin(ang), np.cos(ang)], axis=-1)
        np.testing.assert_allclose(got, want, atol=1e-5)


class TestFullModelConverted:
    def test_end_to_end_with_converted_weights(self, rng):
        """Full tiny model: synthetic reference-format state dict -> convert
        -> one-click predict runs and is deterministic."""
        from tests.test_convert import ref_state_dict

        model = PointCloudSAM(PointSAMConfig(
            vit="tiny", tokenizer=TokenizerConfig(16, 8), prompt_iters=2))
        variables = init_variables(model, jax.random.PRNGKey(0))
        new_vars, report = convert.convert_state_dict(
            ref_state_dict(), variables)
        assert not report["unfilled"]
        coords = rng.standard_normal((1, 200, 3)).astype(np.float32) / 3
        feats = rng.random((1, 200, 3)).astype(np.float32)
        m1, _ = model.apply(new_vars, jnp.asarray(coords), jnp.asarray(feats),
                            jnp.asarray(coords[:, :1]),
                            jnp.ones((1, 1), bool),
                            method=model.predict_masks)
        m2, _ = model.apply(new_vars, jnp.asarray(coords), jnp.asarray(feats),
                            jnp.asarray(coords[:, :1]),
                            jnp.ones((1, 1), bool),
                            method=model.predict_masks)
        np.testing.assert_array_equal(np.asarray(m1), np.asarray(m2))
