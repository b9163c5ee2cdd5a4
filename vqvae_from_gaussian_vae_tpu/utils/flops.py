"""Analytic FLOP estimator for roofline accounting.

The reference's only profiling artifact is a FLOP counter inside its dormant
hdit model (`/root/reference/pit/modules/hdit.py:44-87`); here the estimator
covers the real workloads (UNet/ViT forward + GQ search) and feeds bench.py's
roofline fraction (BASELINE.md: >=95% of roofline images/sec/chip target).
"""

from __future__ import annotations

from typing import Dict

# per-chip peak dense matmul throughput (FLOP/s)
TPU_PEAKS: Dict[str, float] = {
    # v5e (v5 lite) MXU peak; fp32 convs lower to multi-pass bf16 under
    # xla_allow_excess_precision, so this is the ceiling for both dtypes
    "v5e_bf16": 197e12,
    "v5e_fp32": 197e12,
}


def conv2d_flops(h: int, w: int, cin: int, cout: int, k: int = 3) -> float:
    return 2.0 * h * w * cin * cout * k * k


def attn_flops(tokens: int, channels: int) -> float:
    # qkv+proj projections + 2 attention matmuls (single head)
    return 2.0 * tokens * channels * channels * 4 + 2.0 * 2.0 * tokens * tokens * channels


def unet_encoder_flops(cfg: Dict) -> float:
    ch = cfg["ch"]
    ch_mult = list(cfg["ch_mult"])
    res = cfg["resolution"]
    n_blocks = cfg["num_res_blocks"]
    attn_res = set(cfg.get("attn_resolutions", []))
    zc = cfg["z_channels"] * (2 if cfg.get("double_z", True) else 1)
    total = conv2d_flops(res, res, cfg.get("in_channels", 3), ch)
    in_mult = [1] + ch_mult
    cur = res
    for i, mult in enumerate(ch_mult):
        cin, cout = ch * in_mult[i], ch * mult
        for _ in range(n_blocks):
            total += conv2d_flops(cur, cur, cin, cout) + conv2d_flops(cur, cur, cout, cout)
            if cin != cout:
                total += conv2d_flops(cur, cur, cin, cout, k=1)
            cin = cout
            if cur in attn_res:
                total += attn_flops(cur * cur, cout)
        if i != len(ch_mult) - 1:
            total += conv2d_flops(cur // 2, cur // 2, cout, cout)
            cur //= 2
    c_mid = ch * ch_mult[-1]
    total += 2 * (2 * conv2d_flops(cur, cur, c_mid, c_mid))
    total += conv2d_flops(cur, cur, c_mid, zc)
    return total


def unet_decoder_flops(cfg: Dict) -> float:
    ch = cfg["ch"]
    ch_mult = list(cfg["ch_mult"])
    res = cfg["resolution"]
    n_blocks = cfg["num_res_blocks"] + 1
    attn_res = set(cfg.get("attn_resolutions", []))
    cur = res // 2 ** (len(ch_mult) - 1)
    block_in = ch * ch_mult[-1]
    total = conv2d_flops(cur, cur, cfg["z_channels"], block_in)
    total += 2 * (2 * conv2d_flops(cur, cur, block_in, block_in))
    for i in reversed(range(len(ch_mult))):
        block_out = ch * ch_mult[i]
        for _ in range(n_blocks):
            total += conv2d_flops(cur, cur, block_in, block_out) + conv2d_flops(cur, cur, block_out, block_out)
            if block_in != block_out:
                total += conv2d_flops(cur, cur, block_in, block_out, k=1)
            block_in = block_out
            if cur in attn_res:
                total += attn_flops(cur * cur, block_out)
        if i != 0:
            cur *= 2
            total += conv2d_flops(cur, cur, block_out, block_out)
    total += conv2d_flops(res, res, ch * ch_mult[0], cfg.get("out_ch", 3))
    return total


def _vit_trunk_flops(cfg: Dict) -> float:
    p = cfg["patch_size"]
    l = (cfg["image_size"] // p) ** 2
    w = cfg["width"]
    layers = cfg["layers"]
    mlp = cfg.get("mlp_ratio", 4.0)
    per_layer = (2.0 * l * w * w * 4 + 2.0 * 2.0 * l * l * w
                 + 2.0 * l * w * (w * mlp) * 2)
    return layers * per_layer


def vit_flops(cfg: Dict) -> float:
    """Encoder-side ViT forward: trunk + patch projection + quant head
    (models/vit.py TransformerEncoder)."""
    p = cfg["patch_size"]
    l = (cfg["image_size"] // p) ** 2
    w = cfg["width"]
    z = cfg.get("z_channels", 0)
    quant = 2.0 * l * w * (2 * z if cfg.get("double_z", True) else z)
    return _vit_trunk_flops(cfg) + 2.0 * l * (3 * p * p) * w + quant


def vit_decoder_flops(cfg: Dict) -> float:
    """Decoder-side ViT forward: post_quant_embed + trunk + tanh-FFN output
    head + conv_out patch head (models/vit.py TransformerDecoder)."""
    p = cfg["patch_size"]
    l = (cfg["image_size"] // p) ** 2
    w = cfg["width"]
    z = cfg.get("z_channels", 0)
    out_feats = 3 * p * p
    heads = 2.0 * l * z * w  # post_quant_embed
    if cfg.get("use_ffn_output", True):
        ffn = cfg.get("dim_ffn_output", 3072)
        heads += 2.0 * l * w * ffn + 2.0 * l * ffn * out_feats
    else:
        heads += 2.0 * l * w * out_feats
    return _vit_trunk_flops(cfg) + heads


def flux_mmdit_flops(l_img: int, l_txt: int, hidden: int,
                     depth: int, depth_single: int,
                     mlp_ratio: float = 4.0) -> float:
    """One Flux forward (models/flux.py; reference
    `pit/modules/flux/model.py:27`).  Per block — double or single, the
    totals coincide — tokens L get a 3h qkv projection, 2 L^2-by-h
    attention matmuls, an h-by-h output projection, and an
    h<->mlp_ratio*h MLP: 2Lh^2(4 + 2*mlp_ratio) + 4L^2h.  Embedders,
    modulations and the final layer are O(h^2) or O(Lh) and ignored."""
    l = l_img + l_txt
    per_block = 2.0 * l * hidden * hidden * (4 + 2 * mlp_ratio) \
        + 4.0 * l * l * hidden
    return (depth + depth_single) * per_block


def gq_search_flops(rows: int, group: int, n_samples: int) -> float:
    """One (R, 2G) x (2G, N) matmul (ops/gq_search.py)."""
    return 2.0 * rows * 2 * group * n_samples


def vgg16_flops(h: int, w: int) -> float:
    """LPIPS VGG16 trunk forward (losses/lpips.py; torchvision layout).
    The 1x1 NetLin heads are negligible."""
    total, cin = 0.0, 3
    for width, n in ((64, 2), (128, 2), (256, 3), (512, 3), (512, 3)):
        for _ in range(n):
            total += conv2d_flops(h, w, cin, width)
            cin = width
        h, w = h // 2, w // 2
    return total


def nlayer_disc_flops(h: int, w: int, ndf: int = 160, n_layers: int = 6,
                      in_ch: int = 3) -> float:
    """PatchGAN discriminator forward (losses/discriminator.py, pix2pix
    layout: 4x4 convs, n_layers stride-2 then one stride-1 + 1-ch head)."""
    total = conv2d_flops(h // 2, w // 2, in_ch, ndf, k=4)
    nf_prev, cur_h, cur_w = 1, h // 2, w // 2
    for n in range(1, n_layers):
        nf = min(2 ** n, 8)
        cur_h, cur_w = cur_h // 2, cur_w // 2
        total += conv2d_flops(cur_h, cur_w, ndf * nf_prev, ndf * nf, k=4)
        nf_prev = nf
    nf = min(2 ** n_layers, 8)
    total += conv2d_flops(cur_h, cur_w, ndf * nf_prev, ndf * nf, k=4)
    total += conv2d_flops(cur_h, cur_w, ndf * nf, 1, k=4)
    return total


def gan_train_step_flops(enc_cfg: Dict, img: int = 256, ndf: int = 160,
                         n_layers: int = 6, adaptive: bool = True) -> Dict[str, float]:
    """Per-image FLOPs of the two GAN training phases
    (parallel/train_step.py), for rooflining the training path.

    Accounting (conv-matmul FLOPs only; GN/activations are bandwidth, the
    GQ train branch is elementwise):
      * trainable nets cost fwd + full bwd = 3x forward (dgrad + wgrad);
      * frozen nets on the loss path (LPIPS, disc in g_loss) cost
        fwd + dgrad = 2x forward on the gradient branch, 1x on pure-input
        branches (LPIPS(x));
      * the adaptive d_weight (`discriminator_loss.py:211-220` as targeted
        VJPs, train_step.py:_adaptive_d_weight) re-runs the nll head
        (LPIPS fwd+dgrad) and the g head (disc fwd+dgrad); the conv_out-only
        decode_last_layer re-run is negligible.
    """
    enc = unet_encoder_flops(enc_cfg)
    dec = unet_decoder_flops(enc_cfg)
    return gan_train_step_flops_from_backbone(enc, dec, img=img, ndf=ndf,
                                              n_layers=n_layers,
                                              adaptive=adaptive)


# v5e HBM bandwidth (bytes/s) for bandwidth-floor accounting of the
# normalization traffic buckets (docs/kernels.md "Pallas GroupNorm" note)
TPU_HBM_BW = {"v5e": 819e9}


def unet_groupnorm_elems(cfg: Dict) -> float:
    """Total elements flowing through GroupNorm sites in ONE UNet
    encoder+decoder forward (per image).  Each ResnetBlock normalizes its
    input and its hidden (models/unet.py), attention blocks normalize
    once, plus the mid blocks and the decoder's norm_out.  Multiply by
    bytes/element and the empirical pass count (fwd: stats read +
    normalize read/write; bwd adds dy/x reads and a dx write) to get the
    bandwidth floor of the GN bucket in a traced train step."""
    ch = cfg["ch"]
    ch_mult = list(cfg["ch_mult"])
    res = cfg["resolution"]
    n_blocks = cfg["num_res_blocks"]
    attn_res = set(cfg.get("attn_resolutions", []))
    total = 0.0
    # encoder
    in_mult = [1] + ch_mult
    cur = res
    for i, mult in enumerate(ch_mult):
        cin, cout = ch * in_mult[i], ch * mult
        for _ in range(n_blocks):
            total += cur * cur * (cin + cout)  # norm1(in) + norm2(hidden)
            cin = cout
            if cur in attn_res:
                total += cur * cur * cout
        if i != len(ch_mult) - 1:
            cur //= 2
    c_mid = ch * ch_mult[-1]
    total += 2 * (2 * cur * cur * c_mid)      # 2 mid resblocks
    total += cur * cur * c_mid                 # encoder norm_out
    # decoder (num_res_blocks + 1 per level, reversed)
    total += 2 * (2 * cur * cur * c_mid)
    block_in = c_mid
    for i in reversed(range(len(ch_mult))):
        block_out = ch * ch_mult[i]
        for _ in range(n_blocks + 1):
            total += cur * cur * (block_in + block_out)
            block_in = block_out
            if cur in attn_res:
                total += cur * cur * block_out
        if i != 0:
            cur *= 2
    total += cur * cur * block_in              # decoder norm_out
    return total


def vit_layernorm_elems(cfg: Dict) -> float:
    """Elements through LayerNorm sites in ONE ViT trunk forward
    (models/vit.py): ln_1 + ln_2 per ResidualAttentionBlock plus
    ln_pre/ln_post.  Each site reads and writes its (L, W) activation
    once (the one-pass Pallas kernel, ops/layer_norm.py), so the
    bandwidth floor is elems * bytes/elem * 2 / HBM_BW."""
    p = cfg["patch_size"]
    l = (cfg["image_size"] // p) ** 2
    return (2 * cfg["layers"] + 2) * l * cfg["width"]


def gq_search_extra(rows: int, group: int, n_samples: int) -> float:
    """Extra time-equivalent FLOPs of the GQ search beyond its full-peak
    charge: the (R, 2G) x (2G, N) matmul's contraction depth K = 2*group
    is below the MXU's 128 systolic rows, so it runs at K/128 of peak
    (docs/kernels.md round 2e: the kernel sits at this practical floor)."""
    r = 128.0 / min(2 * group, 128)
    return (r - 1.0) * gq_search_flops(rows, group, n_samples)


def vit_train_attention_extra(cfg: Dict, *, trainable: bool = True) -> float:
    """Extra time-equivalent FLOPs (beyond the `gan_train_step_flops`
    charge) that a ViT trunk's attention costs on the MXU, per forward
    (+backward when trainable).

    Two physical effects the plain FLOP count hides (docs/kernels.md
    round 2f):

    * head-dim-limited matmuls: the MXU is a 128x128 systolic array on
      BOTH axes, so a per-head attention matmul with D < 128 runs at
      min(D, 128)/128 of peak whichever side D lands on — QK^T (and the
      backward's s-recompute / dp) by contraction depth, AV (and
      dq/dk/dv, whose outputs are D lanes wide) by output-lane width.
      For bsqvit's D = 64 every per-head attention matmul is half rate
      (the round-2f convention: the flash bucket's achievable floor is
      2x its full-MXU ideal).
    * the flash backward recomputes QK^T in-VMEM (ops/flash_blc.py) —
      one extra m-sized matmul per layer that the 2x-forward backward
      charge does not include (it is cheaper than the HBM round-trip for
      a stored probability tensor, but it is still real MXU time).

    With m = one attention matmul's FLOPs (2 L^2 w per layer) and
    r = 128/min(D,128):  forward = 2 r m actual vs 2 m charged, extra =
    2 (r-1) m;  backward = 5 matmuls (s, dp, dq, dk, dv) at rate r vs
    the charged 2x-forward 4 m, extra = (5 r - 4) m.  Returns the summed
    extra for this trunk; add it to the `gan_train_step_flops`
    denominator to get the *achievable* ceiling (time-equivalent FLOPs /
    peak = achievable step time).
    """
    p = cfg["patch_size"]
    l = (cfg["image_size"] // p) ** 2
    w = cfg["width"]
    d_head = w // cfg.get("heads", cfg.get("num_heads", 12))
    m = cfg["layers"] * 2.0 * l * l * w
    r = 128.0 / min(d_head, 128)
    extra = 2.0 * (r - 1.0) * m
    if trainable:
        extra += (5.0 * r - 4.0) * m
    return extra


def gan_train_step_flops_from_backbone(enc: float, dec: float, *,
                                       img: int = 256, ndf: int = 160,
                                       n_layers: int = 6,
                                       adaptive: bool = True) -> Dict[str, float]:
    """`gan_train_step_flops` for arbitrary encoder/decoder forward FLOPs
    (e.g. the bsqvit transcoder via `vit_flops`); the loss-path accounting
    is backbone-independent."""
    lpips = vgg16_flops(img, img)
    disc = nlayer_disc_flops(img, img, ndf, n_layers)
    ae = 3.0 * (enc + dec)            # engine fwd + bwd
    ae += lpips                       # LPIPS(x): forward only
    ae += 2.0 * lpips                 # LPIPS(xrec): fwd + dgrad back to xrec
    ae += 2.0 * disc                  # g_loss disc(xrec): fwd + dgrad
    adaptive_extra = 2.0 * lpips + 2.0 * disc if adaptive else 0.0
    disc_phase = (enc + dec)          # fresh xrec, no grad
    disc_phase += 2.0 * 3.0 * disc    # disc(x) and disc(xrec), trained
    return {
        "ae_step": ae + adaptive_extra,
        "ae_step_no_adaptive": ae,
        "adaptive_extra": adaptive_extra,
        "disc_step": disc_phase,
        "pair_avg": (ae + adaptive_extra + disc_phase) / 2.0,
    }
