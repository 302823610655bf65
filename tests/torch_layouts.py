"""Synthetic HF/diffusers state-dict generators (keys + shapes).

Derived independently from the diffusers channel-flow rules, so they
cross-check the converter's key mapping: if either side misnames or
mis-shapes a weight, validate_structure fails.

Arrays are np.zeros (lazily allocated), so even the real SD1.5/SDXL layouts
are cheap to generate.
"""

import numpy as np

from elasticdiffusion_tpu.configs import CLIPTextConfig, UNetConfig, VAEConfig


def z(*shape):
    return np.zeros(shape, np.float32)


def _resnet(sd, pre, cin, cout, temb=None):
    sd[f"{pre}.norm1.weight"] = z(cin)
    sd[f"{pre}.norm1.bias"] = z(cin)
    sd[f"{pre}.conv1.weight"] = z(cout, cin, 3, 3)
    sd[f"{pre}.conv1.bias"] = z(cout)
    if temb is not None:
        sd[f"{pre}.time_emb_proj.weight"] = z(cout, temb)
        sd[f"{pre}.time_emb_proj.bias"] = z(cout)
    sd[f"{pre}.norm2.weight"] = z(cout)
    sd[f"{pre}.norm2.bias"] = z(cout)
    sd[f"{pre}.conv2.weight"] = z(cout, cout, 3, 3)
    sd[f"{pre}.conv2.bias"] = z(cout)
    if cin != cout:
        sd[f"{pre}.conv_shortcut.weight"] = z(cout, cin, 1, 1)
        sd[f"{pre}.conv_shortcut.bias"] = z(cout)


def _transformer(sd, pre, ch, ctx, depth, linear_proj):
    sd[f"{pre}.norm.weight"] = z(ch)
    sd[f"{pre}.norm.bias"] = z(ch)
    for io in ("proj_in", "proj_out"):
        sd[f"{pre}.{io}.weight"] = z(ch, ch) if linear_proj else z(ch, ch, 1, 1)
        sd[f"{pre}.{io}.bias"] = z(ch)
    for k in range(depth):
        b = f"{pre}.transformer_blocks.{k}"
        for n in ("norm1", "norm2", "norm3"):
            sd[f"{b}.{n}.weight"] = z(ch)
            sd[f"{b}.{n}.bias"] = z(ch)
        for a, kv in (("attn1", ch), ("attn2", ctx)):
            sd[f"{b}.{a}.to_q.weight"] = z(ch, ch)
            sd[f"{b}.{a}.to_k.weight"] = z(ch, kv)
            sd[f"{b}.{a}.to_v.weight"] = z(ch, kv)
            sd[f"{b}.{a}.to_out.0.weight"] = z(ch, ch)
            sd[f"{b}.{a}.to_out.0.bias"] = z(ch)
        sd[f"{b}.ff.net.0.proj.weight"] = z(ch * 8, ch)
        sd[f"{b}.ff.net.0.proj.bias"] = z(ch * 8)
        sd[f"{b}.ff.net.2.weight"] = z(ch, ch * 4)
        sd[f"{b}.ff.net.2.bias"] = z(ch)


def _unet_core(sd, cfg: UNetConfig):
    """conv_in + time/add embeddings + down blocks + mid. Returns residual
    channel stack (for the up path / controlnet zero-convs)."""
    bo = cfg.block_out_channels
    temb = bo[0] * 4
    sd["conv_in.weight"] = z(bo[0], cfg.in_channels, 3, 3)
    sd["conv_in.bias"] = z(bo[0])
    sd["time_embedding.linear_1.weight"] = z(temb, bo[0])
    sd["time_embedding.linear_1.bias"] = z(temb)
    sd["time_embedding.linear_2.weight"] = z(temb, temb)
    sd["time_embedding.linear_2.bias"] = z(temb)
    if cfg.addition_embed_type == "text_time":
        sd["add_embedding.linear_1.weight"] = z(
            temb, cfg.projection_class_embeddings_input_dim)
        sd["add_embedding.linear_1.bias"] = z(temb)
        sd["add_embedding.linear_2.weight"] = z(temb, temb)
        sd["add_embedding.linear_2.bias"] = z(temb)

    stack = [bo[0]]
    cin = bo[0]
    n = len(bo)
    for i in range(n):
        for j in range(cfg.layers_per_block):
            _resnet(sd, f"down_blocks.{i}.resnets.{j}", cin, bo[i], temb)
            if cfg.down_block_has_attn[i]:
                _transformer(sd, f"down_blocks.{i}.attentions.{j}", bo[i],
                             cfg.cross_attention_dim,
                             cfg.transformer_layers_per_block[i],
                             cfg.use_linear_projection)
            cin = bo[i]
            stack.append(cin)
        if i < n - 1:
            sd[f"down_blocks.{i}.downsamplers.0.conv.weight"] = z(bo[i], bo[i], 3, 3)
            sd[f"down_blocks.{i}.downsamplers.0.conv.bias"] = z(bo[i])
            stack.append(bo[i])

    _resnet(sd, "mid_block.resnets.0", bo[-1], bo[-1], temb)
    _transformer(sd, "mid_block.attentions.0", bo[-1], cfg.cross_attention_dim,
                 cfg.transformer_layers_per_block[-1], cfg.use_linear_projection)
    _resnet(sd, "mid_block.resnets.1", bo[-1], bo[-1], temb)
    return stack, temb


def unet_state_dict(cfg: UNetConfig):
    sd = {}
    stack, temb = _unet_core(sd, cfg)
    bo = cfg.block_out_channels
    n = len(bo)
    x_ch = bo[-1]
    for k in range(n):
        i = n - 1 - k
        for j in range(cfg.layers_per_block + 1):
            skip = stack.pop()
            _resnet(sd, f"up_blocks.{k}.resnets.{j}", x_ch + skip, bo[i], temb)
            if cfg.down_block_has_attn[i]:
                _transformer(sd, f"up_blocks.{k}.attentions.{j}", bo[i],
                             cfg.cross_attention_dim,
                             cfg.transformer_layers_per_block[i],
                             cfg.use_linear_projection)
            x_ch = bo[i]
        if i > 0:
            sd[f"up_blocks.{k}.upsamplers.0.conv.weight"] = z(bo[i], bo[i], 3, 3)
            sd[f"up_blocks.{k}.upsamplers.0.conv.bias"] = z(bo[i])
    sd["conv_norm_out.weight"] = z(bo[0])
    sd["conv_norm_out.bias"] = z(bo[0])
    sd["conv_out.weight"] = z(cfg.out_channels, bo[0], 3, 3)
    sd["conv_out.bias"] = z(cfg.out_channels)
    return sd


def controlnet_state_dict(cfg: UNetConfig, cond_channels=(16, 32, 96, 256)):
    sd = {}
    stack, _ = _unet_core(sd, cfg)
    ce = "controlnet_cond_embedding"
    c = cond_channels
    sd[f"{ce}.conv_in.weight"] = z(c[0], 3, 3, 3)
    sd[f"{ce}.conv_in.bias"] = z(c[0])
    for m in range(len(c) - 1):
        sd[f"{ce}.blocks.{2 * m}.weight"] = z(c[m], c[m], 3, 3)
        sd[f"{ce}.blocks.{2 * m}.bias"] = z(c[m])
        sd[f"{ce}.blocks.{2 * m + 1}.weight"] = z(c[m + 1], c[m], 3, 3)
        sd[f"{ce}.blocks.{2 * m + 1}.bias"] = z(c[m + 1])
    sd[f"{ce}.conv_out.weight"] = z(cfg.block_out_channels[0], c[-1], 3, 3)
    sd[f"{ce}.conv_out.bias"] = z(cfg.block_out_channels[0])
    for k, ch in enumerate(stack):
        sd[f"controlnet_down_blocks.{k}.weight"] = z(ch, ch, 1, 1)
        sd[f"controlnet_down_blocks.{k}.bias"] = z(ch)
    bo_last = cfg.block_out_channels[-1]
    sd["controlnet_mid_block.weight"] = z(bo_last, bo_last, 1, 1)
    sd["controlnet_mid_block.bias"] = z(bo_last)
    return sd


def vae_state_dict(cfg: VAEConfig, legacy_attn=False):
    sd = {}
    bo = cfg.block_out_channels
    n = len(bo)
    l = cfg.latent_channels

    def attn(pre, ch):
        sd[f"{pre}.group_norm.weight"] = z(ch)
        sd[f"{pre}.group_norm.bias"] = z(ch)
        names = ("query", "key", "value") if legacy_attn else ("to_q", "to_k", "to_v")
        for nm in names:
            sd[f"{pre}.{nm}.weight"] = z(ch, ch)
            sd[f"{pre}.{nm}.bias"] = z(ch)
        o = "proj_attn" if legacy_attn else "to_out.0"
        sd[f"{pre}.{o}.weight"] = z(ch, ch)
        sd[f"{pre}.{o}.bias"] = z(ch)

    # encoder
    sd["encoder.conv_in.weight"] = z(bo[0], cfg.in_channels, 3, 3)
    sd["encoder.conv_in.bias"] = z(bo[0])
    cin = bo[0]
    for i in range(n):
        for j in range(cfg.layers_per_block):
            _resnet(sd, f"encoder.down_blocks.{i}.resnets.{j}", cin, bo[i])
            cin = bo[i]
        if i < n - 1:
            sd[f"encoder.down_blocks.{i}.downsamplers.0.conv.weight"] = \
                z(bo[i], bo[i], 3, 3)
            sd[f"encoder.down_blocks.{i}.downsamplers.0.conv.bias"] = z(bo[i])
    _resnet(sd, "encoder.mid_block.resnets.0", bo[-1], bo[-1])
    attn("encoder.mid_block.attentions.0", bo[-1])
    _resnet(sd, "encoder.mid_block.resnets.1", bo[-1], bo[-1])
    sd["encoder.conv_norm_out.weight"] = z(bo[-1])
    sd["encoder.conv_norm_out.bias"] = z(bo[-1])
    sd["encoder.conv_out.weight"] = z(2 * l, bo[-1], 3, 3)
    sd["encoder.conv_out.bias"] = z(2 * l)
    sd["quant_conv.weight"] = z(2 * l, 2 * l, 1, 1)
    sd["quant_conv.bias"] = z(2 * l)
    sd["post_quant_conv.weight"] = z(l, l, 1, 1)
    sd["post_quant_conv.bias"] = z(l)

    # decoder
    rbo = list(reversed(bo))
    sd["decoder.conv_in.weight"] = z(rbo[0], l, 3, 3)
    sd["decoder.conv_in.bias"] = z(rbo[0])
    _resnet(sd, "decoder.mid_block.resnets.0", rbo[0], rbo[0])
    attn("decoder.mid_block.attentions.0", rbo[0])
    _resnet(sd, "decoder.mid_block.resnets.1", rbo[0], rbo[0])
    cin = rbo[0]
    for k in range(n):
        for j in range(cfg.layers_per_block + 1):
            _resnet(sd, f"decoder.up_blocks.{k}.resnets.{j}", cin, rbo[k])
            cin = rbo[k]
        if k < n - 1:
            sd[f"decoder.up_blocks.{k}.upsamplers.0.conv.weight"] = \
                z(rbo[k], rbo[k], 3, 3)
            sd[f"decoder.up_blocks.{k}.upsamplers.0.conv.bias"] = z(rbo[k])
    sd["decoder.conv_norm_out.weight"] = z(rbo[-1])
    sd["decoder.conv_norm_out.bias"] = z(rbo[-1])
    sd["decoder.conv_out.weight"] = z(cfg.out_channels, rbo[-1], 3, 3)
    sd["decoder.conv_out.bias"] = z(cfg.out_channels)
    return sd


def clip_state_dict(cfg: CLIPTextConfig):
    sd = {}
    h = cfg.hidden_size
    sd["text_model.embeddings.token_embedding.weight"] = z(cfg.vocab_size, h)
    sd["text_model.embeddings.position_embedding.weight"] = \
        z(cfg.max_position_embeddings, h)
    for i in range(cfg.num_layers):
        p = f"text_model.encoder.layers.{i}"
        for a in ("q_proj", "k_proj", "v_proj", "out_proj"):
            sd[f"{p}.self_attn.{a}.weight"] = z(h, h)
            sd[f"{p}.self_attn.{a}.bias"] = z(h)
        for nrm in ("layer_norm1", "layer_norm2"):
            sd[f"{p}.{nrm}.weight"] = z(h)
            sd[f"{p}.{nrm}.bias"] = z(h)
        sd[f"{p}.mlp.fc1.weight"] = z(cfg.intermediate_size, h)
        sd[f"{p}.mlp.fc1.bias"] = z(cfg.intermediate_size)
        sd[f"{p}.mlp.fc2.weight"] = z(h, cfg.intermediate_size)
        sd[f"{p}.mlp.fc2.bias"] = z(h)
    sd["text_model.final_layer_norm.weight"] = z(h)
    sd["text_model.final_layer_norm.bias"] = z(h)
    if cfg.projection_dim is not None:
        sd["text_projection.weight"] = z(cfg.projection_dim, h)
    return sd
