"""CLIP (Flax) vs a torch oracle built from the OpenAI architecture spec.

No CLIP weights exist offline, so the oracle is structural: a torch forward
implementing the published ViT/text-transformer blocks (packed-qkv
``nn.MultiheadAttention``, quick-GELU, EOT pooling) over the *same random
state dict* that the converter maps into Flax params. Reference flow:
``inference/icgan_colab.ipynb`` cell "Generate images with IC-GAN + CLIP!".
"""

import numpy as np
import pytest

import jax.numpy as jnp

torch = pytest.importorskip("torch")
import torch.nn.functional as F  # noqa: E402

from ic_gan_tpu.models.clip import (  # noqa: E402
    CLIP, CLIP_MEAN, CLIP_STD, CLIPConfig, config_from_state_dict,
    load_openai_clip,
)

TOY = CLIPConfig(
    image_resolution=16, patch_size=8, vision_width=32, vision_layers=2,
    vision_heads=4, embed_dim=24, context_length=10, vocab_size=50,
    text_width=32, text_layers=2, text_heads=4,
)


def _random_sd(cfg, seed=0):
    rng = np.random.RandomState(seed)

    def r(*shape, s=0.2):
        return (rng.randn(*shape) * s).astype(np.float32)

    sd = {}
    grid = cfg.image_resolution // cfg.patch_size
    vw, tw = cfg.vision_width, cfg.text_width
    sd["visual.conv1.weight"] = r(vw, 3, cfg.patch_size, cfg.patch_size)
    sd["visual.class_embedding"] = r(vw)
    sd["visual.positional_embedding"] = r(grid * grid + 1, vw)
    sd["visual.ln_pre.weight"] = 1 + r(vw, s=0.05)
    sd["visual.ln_pre.bias"] = r(vw, s=0.05)
    sd["visual.ln_post.weight"] = 1 + r(vw, s=0.05)
    sd["visual.ln_post.bias"] = r(vw, s=0.05)
    sd["visual.proj"] = r(vw, cfg.embed_dim)
    sd["token_embedding.weight"] = r(cfg.vocab_size, tw)
    sd["positional_embedding"] = r(cfg.context_length, tw)
    sd["ln_final.weight"] = 1 + r(tw, s=0.05)
    sd["ln_final.bias"] = r(tw, s=0.05)
    sd["text_projection"] = r(tw, cfg.embed_dim)
    sd["logit_scale"] = np.float32(np.log(1 / 0.07))

    def block(prefix, w):
        sd[f"{prefix}.ln_1.weight"] = 1 + r(w, s=0.05)
        sd[f"{prefix}.ln_1.bias"] = r(w, s=0.05)
        sd[f"{prefix}.ln_2.weight"] = 1 + r(w, s=0.05)
        sd[f"{prefix}.ln_2.bias"] = r(w, s=0.05)
        sd[f"{prefix}.attn.in_proj_weight"] = r(3 * w, w)
        sd[f"{prefix}.attn.in_proj_bias"] = r(3 * w, s=0.05)
        sd[f"{prefix}.attn.out_proj.weight"] = r(w, w)
        sd[f"{prefix}.attn.out_proj.bias"] = r(w, s=0.05)
        sd[f"{prefix}.mlp.c_fc.weight"] = r(4 * w, w)
        sd[f"{prefix}.mlp.c_fc.bias"] = r(4 * w, s=0.05)
        sd[f"{prefix}.mlp.c_proj.weight"] = r(w, 4 * w)
        sd[f"{prefix}.mlp.c_proj.bias"] = r(w, s=0.05)

    for i in range(cfg.vision_layers):
        block(f"visual.transformer.resblocks.{i}", vw)
    for i in range(cfg.text_layers):
        block(f"transformer.resblocks.{i}", tw)
    return sd


def _torch_block(sd, prefix, x, heads, causal):
    """x: (L, B, D) — CLIP's sequence-first layout."""
    L, B, D = x.shape

    def ln(name, t):
        return F.layer_norm(t, (D,), torch.from_numpy(sd[f"{prefix}.{name}.weight"]),
                            torch.from_numpy(sd[f"{prefix}.{name}.bias"]), 1e-5)

    y = ln("ln_1", x)
    mask = None
    if causal:
        mask = torch.full((L, L), float("-inf")).triu(1)
    attn_out = F.multi_head_attention_forward(
        y, y, y, D, heads,
        torch.from_numpy(sd[f"{prefix}.attn.in_proj_weight"]),
        torch.from_numpy(sd[f"{prefix}.attn.in_proj_bias"]),
        None, None, False, 0.0,
        torch.from_numpy(sd[f"{prefix}.attn.out_proj.weight"]),
        torch.from_numpy(sd[f"{prefix}.attn.out_proj.bias"]),
        need_weights=False, attn_mask=mask)[0]
    x = x + attn_out
    y = ln("ln_2", x)
    y = y @ torch.from_numpy(sd[f"{prefix}.mlp.c_fc.weight"]).T \
        + torch.from_numpy(sd[f"{prefix}.mlp.c_fc.bias"])
    y = y * torch.sigmoid(1.702 * y)
    y = y @ torch.from_numpy(sd[f"{prefix}.mlp.c_proj.weight"]).T \
        + torch.from_numpy(sd[f"{prefix}.mlp.c_proj.bias"])
    return x + y


def _torch_encode_image(sd, cfg, imgs01):
    x = (torch.from_numpy(imgs01).permute(0, 3, 1, 2)
         - torch.from_numpy(CLIP_MEAN).view(1, 3, 1, 1)) \
        / torch.from_numpy(CLIP_STD).view(1, 3, 1, 1)
    x = F.conv2d(x, torch.from_numpy(sd["visual.conv1.weight"]),
                 stride=cfg.patch_size)
    B, D, gh, gw = x.shape
    x = x.reshape(B, D, gh * gw).permute(0, 2, 1)
    cls = torch.from_numpy(sd["visual.class_embedding"]).expand(B, 1, D)
    x = torch.cat([cls, x], dim=1)
    x = x + torch.from_numpy(sd["visual.positional_embedding"])
    x = F.layer_norm(x, (D,), torch.from_numpy(sd["visual.ln_pre.weight"]),
                     torch.from_numpy(sd["visual.ln_pre.bias"]), 1e-5)
    x = x.permute(1, 0, 2)
    for i in range(cfg.vision_layers):
        x = _torch_block(sd, f"visual.transformer.resblocks.{i}", x,
                         cfg.vision_heads, causal=False)
    x = x.permute(1, 0, 2)[:, 0]
    x = F.layer_norm(x, (D,), torch.from_numpy(sd["visual.ln_post.weight"]),
                     torch.from_numpy(sd["visual.ln_post.bias"]), 1e-5)
    f = x @ torch.from_numpy(sd["visual.proj"])
    return (f / f.norm(dim=-1, keepdim=True)).numpy()


def _torch_encode_text(sd, cfg, tokens):
    t = torch.from_numpy(tokens)
    x = torch.from_numpy(sd["token_embedding.weight"])[t]
    x = x + torch.from_numpy(sd["positional_embedding"])[: x.shape[1]]
    x = x.permute(1, 0, 2)
    for i in range(cfg.text_layers):
        x = _torch_block(sd, f"transformer.resblocks.{i}", x,
                         cfg.text_heads, causal=True)
    x = x.permute(1, 0, 2)
    D = x.shape[-1]
    x = F.layer_norm(x, (D,), torch.from_numpy(sd["ln_final.weight"]),
                     torch.from_numpy(sd["ln_final.bias"]), 1e-5)
    x = x[torch.arange(x.shape[0]), t.argmax(dim=-1)]
    f = x @ torch.from_numpy(sd["text_projection"])
    return (f / f.norm(dim=-1, keepdim=True)).numpy()


def test_config_from_state_dict():
    sd = _random_sd(TOY)
    cfg = config_from_state_dict(sd)
    assert cfg.image_resolution == 16 and cfg.patch_size == 8
    assert cfg.vision_layers == 2 and cfg.text_layers == 2
    assert cfg.embed_dim == 24 and cfg.vocab_size == 50


def test_encode_image_matches_torch():
    sd = _random_sd(TOY, 1)
    variables, cfg = load_openai_clip(sd, TOY)
    net = CLIP(cfg)
    rng = np.random.RandomState(2)
    imgs = rng.rand(3, 16, 16, 3).astype(np.float32)
    with torch.no_grad():
        want = _torch_encode_image(sd, cfg, imgs)
    got = np.asarray(net.apply(variables, jnp.asarray(imgs),
                               method=net.encode_image))
    np.testing.assert_allclose(got, want, rtol=2e-4, atol=2e-5)


def test_encode_text_matches_torch():
    sd = _random_sd(TOY, 3)
    variables, cfg = load_openai_clip(sd, TOY)
    net = CLIP(cfg)
    rng = np.random.RandomState(4)
    tokens = rng.randint(0, 40, size=(3, 10)).astype(np.int32)
    tokens[:, 6] = 49  # EOT: max id, pooled via argmax
    tokens[:, 7:] = 0
    with torch.no_grad():
        want = _torch_encode_text(sd, cfg, tokens)
    got = np.asarray(net.apply(variables, jnp.asarray(tokens),
                               method=net.encode_text))
    np.testing.assert_allclose(got, want, rtol=2e-4, atol=2e-5)


def test_logits_symmetric():
    sd = _random_sd(TOY, 5)
    variables, cfg = load_openai_clip(sd, TOY)
    net = CLIP(cfg)
    rng = np.random.RandomState(6)
    imgs = rng.rand(2, 16, 16, 3).astype(np.float32)
    tokens = rng.randint(0, 50, size=(2, 10)).astype(np.int32)
    li, lt = net.apply(variables, jnp.asarray(imgs), jnp.asarray(tokens))
    np.testing.assert_allclose(np.asarray(li), np.asarray(lt).T, rtol=1e-5)
