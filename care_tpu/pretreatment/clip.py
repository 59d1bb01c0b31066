"""CLIP image/text encoders in Flax (pretreatment as batched XLA inference).

Replaces the torch CLIP usage of the reference pretreatment
(``pretreatment/clip_feats.py`` for frame features, ``clip_text_embs.py``
for caption embeddings): a ViT visual tower + the CLIP text transformer,
with a converter for OpenAI CLIP torch state_dicts (weights must be
provided locally — no downloads). With converted weights, encoding a whole
dataset of frames is one jitted, batched program feeding the MXU.

Architectural constants follow the published CLIP ViT-B/32 configuration.
"""

from typing import Any, Dict, Optional

import numpy as np
import jax
import jax.numpy as jnp
import flax.linen as nn


class QuickGELU(nn.Module):
    @nn.compact
    def __call__(self, x):
        return x * nn.sigmoid(1.702 * x)


class ResidualAttentionBlock(nn.Module):
    d_model: int
    n_head: int

    @nn.compact
    def __call__(self, x, attn_mask=None):
        y = nn.LayerNorm(name="ln_1")(x)
        y = nn.SelfAttention(num_heads=self.n_head, qkv_features=self.d_model,
                             deterministic=True, name="attn")(
            y, mask=attn_mask)
        x = x + y
        y = nn.LayerNorm(name="ln_2")(x)
        y = nn.Dense(self.d_model * 4, name="mlp_fc")(y)
        y = QuickGELU()(y)
        y = nn.Dense(self.d_model, name="mlp_proj")(y)
        return x + y


class CLIPVisionTransformer(nn.Module):
    image_size: int = 224
    patch_size: int = 32
    width: int = 768
    layers: int = 12
    heads: int = 12
    output_dim: int = 512

    @nn.compact
    def __call__(self, images):
        """images: [B, H, W, 3] float32 normalized."""
        b = images.shape[0]
        x = nn.Conv(self.width, (self.patch_size, self.patch_size),
                    strides=(self.patch_size, self.patch_size),
                    use_bias=False, name="conv1")(images)
        x = x.reshape(b, -1, self.width)
        cls = self.param("class_embedding", nn.initializers.normal(0.02),
                         (self.width,))
        x = jnp.concatenate(
            [jnp.broadcast_to(cls[None, None], (b, 1, self.width)), x], axis=1)
        n_pos = (self.image_size // self.patch_size) ** 2 + 1
        pos = self.param("positional_embedding",
                         nn.initializers.normal(0.02), (n_pos, self.width))
        x = x + pos[None]
        x = nn.LayerNorm(name="ln_pre")(x)
        for i in range(self.layers):
            x = ResidualAttentionBlock(self.width, self.heads,
                                       name=f"resblock_{i}")(x)
        x = nn.LayerNorm(name="ln_post")(x[:, 0, :])
        proj = self.param("proj", nn.initializers.normal(0.02),
                          (self.width, self.output_dim))
        return x @ proj


class CLIPTextTransformer(nn.Module):
    vocab_size: int = 49408
    context_length: int = 77
    width: int = 512
    layers: int = 12
    heads: int = 8
    output_dim: int = 512

    @nn.compact
    def __call__(self, token_ids):
        """token_ids: [B, context_length] int32 (argmax position = EOT)."""
        emb = self.param("token_embedding", nn.initializers.normal(0.02),
                         (self.vocab_size, self.width))
        x = jnp.take(emb, token_ids, axis=0)
        pos = self.param("positional_embedding",
                         nn.initializers.normal(0.01),
                         (self.context_length, self.width))
        x = x + pos[None]
        L = self.context_length
        causal = jnp.tril(jnp.ones((L, L), bool))[None, None]
        for i in range(self.layers):
            x = ResidualAttentionBlock(self.width, self.heads,
                                       name=f"resblock_{i}")(x, causal)
        x = nn.LayerNorm(name="ln_final")(x)
        eot = jnp.argmax(token_ids, axis=-1)
        pooled = jnp.take_along_axis(x, eot[:, None, None], axis=1)[:, 0]
        proj = self.param("text_projection", nn.initializers.normal(0.02),
                          (self.width, self.output_dim))
        return pooled @ proj


# ---------------------------------------------------------------------------
# torch state_dict conversion
# ---------------------------------------------------------------------------

def _split_in_proj(w, b, n_head, width):
    """torch packed qkv (3*width, width) -> flax SelfAttention params."""
    head_dim = width // n_head
    out = {}
    for i, name in enumerate(("query", "key", "value")):
        kw = w[i * width:(i + 1) * width].T.reshape(width, n_head, head_dim)
        kb = b[i * width:(i + 1) * width].reshape(n_head, head_dim)
        out[name] = {"kernel": kw, "bias": kb}
    return out


def _convert_blocks(sd, prefix, layers, width, heads):
    blocks = {}
    for i in range(layers):
        p = f"{prefix}.resblocks.{i}."
        attn = _split_in_proj(sd[p + "attn.in_proj_weight"],
                              sd[p + "attn.in_proj_bias"], heads, width)
        attn["out"] = {
            "kernel": sd[p + "attn.out_proj.weight"].T.reshape(
                heads, width // heads, width),
            "bias": sd[p + "attn.out_proj.bias"],
        }
        blocks[f"resblock_{i}"] = {
            "ln_1": {"scale": sd[p + "ln_1.weight"],
                     "bias": sd[p + "ln_1.bias"]},
            "ln_2": {"scale": sd[p + "ln_2.weight"],
                     "bias": sd[p + "ln_2.bias"]},
            "attn": attn,
            "mlp_fc": {"kernel": sd[p + "mlp.c_fc.weight"].T,
                       "bias": sd[p + "mlp.c_fc.bias"]},
            "mlp_proj": {"kernel": sd[p + "mlp.c_proj.weight"].T,
                         "bias": sd[p + "mlp.c_proj.bias"]},
        }
    return blocks


def convert_openai_clip_state_dict(sd: Dict[str, np.ndarray]):
    """Convert an OpenAI CLIP (ViT) torch state_dict (numpy-ified) into
    (vision_params, text_params)."""
    sd = {k: np.asarray(v) for k, v in sd.items()}
    width = sd["visual.conv1.weight"].shape[0]
    patch = sd["visual.conv1.weight"].shape[-1]
    v_layers = len({k.split(".")[3] for k in sd
                    if k.startswith("visual.transformer.resblocks.")})
    v_heads = width // 64

    vision = {
        "conv1": {"kernel": sd["visual.conv1.weight"].transpose(2, 3, 1, 0)},
        "class_embedding": sd["visual.class_embedding"],
        "positional_embedding": sd["visual.positional_embedding"],
        "ln_pre": {"scale": sd["visual.ln_pre.weight"],
                   "bias": sd["visual.ln_pre.bias"]},
        "ln_post": {"scale": sd["visual.ln_post.weight"],
                    "bias": sd["visual.ln_post.bias"]},
        "proj": sd["visual.proj"],
    }
    vision.update(_convert_blocks(sd, "visual.transformer", v_layers,
                                  width, v_heads))

    t_width = sd["ln_final.weight"].shape[0]
    t_layers = len({k.split(".")[2] for k in sd
                    if k.startswith("transformer.resblocks.")})
    t_heads = t_width // 64
    text = {
        "token_embedding": sd["token_embedding.weight"],
        "positional_embedding": sd["positional_embedding"],
        "ln_final": {"scale": sd["ln_final.weight"],
                     "bias": sd["ln_final.bias"]},
        "text_projection": sd["text_projection"],
    }
    text.update(_convert_blocks(sd, "transformer", t_layers, t_width,
                                t_heads))
    meta = {"width": width, "patch": patch, "v_layers": v_layers,
            "t_width": t_width, "t_layers": t_layers}
    return vision, text, meta


IMAGE_MEAN = np.array([0.48145466, 0.4578275, 0.40821073], np.float32)
IMAGE_STD = np.array([0.26862954, 0.26130258, 0.27577711], np.float32)


def preprocess_images(images_uint8: np.ndarray) -> np.ndarray:
    """[B, H, W, 3] uint8 -> normalized float32 (resize/crop is assumed
    done upstream; reference uses CLIP's torchvision preprocess)."""
    x = images_uint8.astype(np.float32) / 255.0
    return (x - IMAGE_MEAN) / IMAGE_STD


def encode_images(params, images, model: Optional[CLIPVisionTransformer] = None,
                  batch_size: int = 256):
    model = model or CLIPVisionTransformer()
    fn = jax.jit(lambda p, x: model.apply({"params": p}, x))
    outs = []
    for i in range(0, images.shape[0], batch_size):
        outs.append(np.asarray(fn(params, jnp.asarray(
            images[i:i + batch_size]))))
    return np.concatenate(outs, axis=0)


def encode_texts(params, token_ids, model: Optional[CLIPTextTransformer] = None,
                 batch_size: int = 1024):
    model = model or CLIPTextTransformer()
    fn = jax.jit(lambda p, x: model.apply({"params": p}, x))
    outs = []
    for i in range(0, token_ids.shape[0], batch_size):
        outs.append(np.asarray(fn(params, jnp.asarray(
            token_ids[i:i + batch_size]))))
    return np.concatenate(outs, axis=0)
