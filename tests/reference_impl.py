"""Independent NumPy float64 reference implementation for correctness tests.

Deliberately written as straightforward full-sequence math (no KV caches, no
scans, explicit loops) mirroring the reference engine's semantics
(/root/reference/src/tts_transformer.cpp, audio_tokenizer_decoder.cpp), so
that errors in the JAX implementation cannot correlate with errors here.
"""

from __future__ import annotations

import numpy as np


# --------------------------------------------------------------------------
# primitives
# --------------------------------------------------------------------------

def rms_norm(x, w, eps):
    x = np.asarray(x, np.float64)
    return x / np.sqrt(np.mean(x * x, axis=-1, keepdims=True) + eps) * w


def silu(x):
    return x / (1.0 + np.exp(-x))


def neox_rope(x, positions, theta):
    """x: [T, H, D]; rotate pairs (i, i + D/2)."""
    T, H, D = x.shape
    half = D // 2
    inv_freq = theta ** (-np.arange(half, dtype=np.float64) / half)
    ang = np.asarray(positions, np.float64)[:, None] * inv_freq  # [T, half]
    cos, sin = np.cos(ang), np.sin(ang)
    out = np.empty_like(x, dtype=np.float64)
    x1, x2 = x[..., :half], x[..., half:]
    out[..., :half] = x1 * cos[:, None, :] - x2 * sin[:, None, :]
    out[..., half:] = x1 * sin[:, None, :] + x2 * cos[:, None, :]
    return out


def causal_attention(q, k, v, n_kv_heads):
    """q: [T, Hq, D], k/v: [T, Hkv, D] (full sequence, causal)."""
    T, Hq, D = q.shape
    group = Hq // n_kv_heads
    out = np.zeros_like(q)
    for h in range(Hq):
        kh = h // group
        scores = (q[:, h, :] @ k[:, kh, :].T) / np.sqrt(D)  # [T, T]
        mask = np.tril(np.ones((T, T), dtype=bool))
        scores = np.where(mask, scores, -np.inf)
        scores -= scores.max(axis=-1, keepdims=True)
        p = np.exp(scores)
        p /= p.sum(axis=-1, keepdims=True)
        out[:, h, :] = p @ v[:, kh, :]
    return out


def block_forward(x, bp, li, n_heads, n_kv_heads, head_dim, eps, theta, positions):
    """One decoder block over the full sequence. bp fields are stacked [L,...]
    with the same [in, out] weight convention as the JAX side."""
    T = x.shape[0]
    h = rms_norm(x, np.asarray(bp.attn_norm[li], np.float64), eps)
    wqkv = np.asarray(bp.wqkv[li], np.float64)
    nq, nk = n_heads * head_dim, n_kv_heads * head_dim
    q = (h @ wqkv[:, :nq]).reshape(T, n_heads, head_dim)
    k = (h @ wqkv[:, nq:nq + nk]).reshape(T, n_kv_heads, head_dim)
    v = (h @ wqkv[:, nq + nk:]).reshape(T, n_kv_heads, head_dim)
    q = rms_norm(q, np.asarray(bp.q_norm[li], np.float64), eps)
    k = rms_norm(k, np.asarray(bp.k_norm[li], np.float64), eps)
    q = neox_rope(q, positions, theta)
    k = neox_rope(k, positions, theta)
    o = causal_attention(q, k, v, n_kv_heads).reshape(T, n_heads * head_dim)
    x = x + o @ np.asarray(bp.wo[li], np.float64)
    h = rms_norm(x, np.asarray(bp.ffn_norm[li], np.float64), eps)
    gateup = h @ np.asarray(bp.w_gateup[li], np.float64)
    F = bp.w_down[li].shape[0]
    x = x + (silu(gateup[:, :F]) * gateup[:, F:]) @ np.asarray(bp.w_down[li], np.float64)
    return x


def stack_forward(x, blocks, n_layers, n_heads, n_kv_heads, head_dim, eps, theta, positions):
    for li in range(n_layers):
        x = block_forward(x, blocks, li, n_heads, n_kv_heads, head_dim, eps, theta, positions)
    return x


# --------------------------------------------------------------------------
# talker
# --------------------------------------------------------------------------

def text_projection(tp, tokens):
    x = np.asarray(tp.text_embd, np.float64)[np.asarray(tokens)]
    x = x @ np.asarray(tp.text_proj_fc1_w, np.float64) + np.asarray(tp.text_proj_fc1_b, np.float64)
    x = silu(x)
    x = x @ np.asarray(tp.text_proj_fc2_w, np.float64) + np.asarray(tp.text_proj_fc2_b, np.float64)
    return x


def build_prefill(tp, cfg, tokens, speaker, language_id):
    """Mirror of tts_transformer.cpp:984-1122 (think variant)."""
    codec_embd = np.asarray(tp.codec_embd, np.float64)
    specials = text_projection(tp, [cfg.tts_bos_token_id, cfg.tts_eos_token_id, cfg.tts_pad_token_id])
    tts_bos, tts_eos, tts_pad = specials
    role = text_projection(tp, tokens[:3])
    codec_prefill_ids = [cfg.codec_think_id, cfg.codec_think_bos_id, language_id, cfg.codec_think_eos_id]
    codec_input = np.concatenate([
        codec_embd[codec_prefill_ids],
        np.asarray(speaker, np.float64)[None],
        codec_embd[[cfg.codec_pad_id, cfg.codec_bos_id]],
    ])
    n = len(codec_input)
    overlay = np.empty((n - 1, codec_input.shape[1]))
    for t in range(n - 1):
        ov = tts_bos if t == n - 2 else tts_pad
        overlay[t] = codec_input[t] + ov
    first_text = text_projection(tp, tokens[3:4])[0]
    last = first_text + codec_input[-1]
    prefill = np.concatenate([role, overlay, last[None]])

    trailing_count = max(0, len(tokens) - 9)
    rows = []
    if trailing_count:
        rows.append(text_projection(tp, tokens[4:4 + trailing_count]))
    rows.append(tts_eos[None])
    trailing = np.concatenate(rows)
    return prefill, trailing, tts_pad


def talker_logits_full(tp, cfg, embd_seq):
    """Run the talker over a full embedding sequence; return per-position
    output-normed hidden and logits (no cache — recomputed per call)."""
    positions = np.arange(len(embd_seq))
    x = stack_forward(np.asarray(embd_seq, np.float64), tp.blocks, cfg.n_layers,
                      cfg.n_heads, cfg.n_kv_heads, cfg.head_dim,
                      cfg.rms_norm_eps, cfg.rope_theta, positions)
    normed = rms_norm(x, np.asarray(tp.output_norm, np.float64), cfg.rms_norm_eps)
    logits = normed @ np.asarray(tp.codec_head, np.float64)
    return normed, logits


def code_predictor_greedy(cp, cfg, hidden, cb0_embd):
    """AR greedy code prediction by full-sequence recomputation each step."""
    seq = [np.asarray(hidden, np.float64), np.asarray(cb0_embd, np.float64)]
    codes = []
    for step in range(cfg.n_steps):
        if step > 0:
            seq.append(np.asarray(cp.embds, np.float64)[step - 1, codes[-1]])
        x = np.stack(seq)
        positions = np.arange(len(seq))
        h = stack_forward(x, cp.blocks, cfg.n_layers, cfg.n_heads, cfg.n_kv_heads,
                          cfg.head_dim, cfg.rms_norm_eps, cfg.rope_theta, positions)
        h = rms_norm(h[-1], np.asarray(cp.output_norm, np.float64), cfg.rms_norm_eps)
        logits = h @ np.asarray(cp.heads, np.float64)[step]
        codes.append(int(np.argmax(logits)))
    return codes


def generate_greedy(tp, cp, tcfg, ccfg, tokens, speaker, language_id, max_frames):
    """Full greedy generation mirroring tts_transformer.cpp:2577-2804, done by
    recomputing the whole sequence every frame (no KV cache)."""
    prefill, trailing, tts_pad = build_prefill(tp, tcfg, tokens, speaker, language_id)
    codec_embd = np.asarray(tp.codec_embd, np.float64)
    cp_embds = np.asarray(cp.embds, np.float64)
    seq = list(prefill)
    seen = set()
    frames = []
    suppress_start = tcfg.codec_vocab_size - 1024
    for frame in range(max_frames):
        normed, logits = talker_logits_full(tp, tcfg, np.stack(seq))
        l = logits[-1].copy()
        for i in range(suppress_start, tcfg.codec_vocab_size):
            if i != tcfg.codec_eos_id:
                l[i] = -np.inf
        for t in seen:
            if l[t] > 0:
                l[t] /= 1.05
            else:
                l[t] *= 1.05
        cb0 = int(np.argmax(l))
        if cb0 == tcfg.codec_eos_id:
            break
        seen.add(cb0)
        rest = code_predictor_greedy(cp, ccfg, normed[-1], codec_embd[cb0])
        frames.append([cb0] + rest)
        step = codec_embd[cb0].copy()
        for cb in range(1, 16):
            step = step + cp_embds[cb - 1, frames[-1][cb]]
        trailing_row = trailing[frame] if frame < len(trailing) else tts_pad
        step = step + trailing_row
        seq.append(step)
    return np.array(frames, dtype=np.int64).reshape(-1, 16)


# --------------------------------------------------------------------------
# vocoder
# --------------------------------------------------------------------------

def conv1d_ref(x, w, b, dilation=1, groups=1, causal=True):
    """x: [T, Cin], w: [K, Cin/groups, Cout] (same layout as JAX side)."""
    K, _, Cout = w.shape
    T, Cin = x.shape
    pad = dilation * (K - 1)
    if causal:
        xp = np.concatenate([np.zeros((pad, Cin)), x])
    else:
        xp = np.concatenate([np.zeros((pad // 2, Cin)), x, np.zeros((pad - pad // 2, Cin))])
    y = np.zeros((T, Cout))
    group_in = Cin // groups
    group_out = Cout // groups
    for t in range(T):
        for k in range(K):
            xt = xp[t + k * dilation]
            for g in range(groups):
                y[t, g * group_out:(g + 1) * group_out] += (
                    xt[g * group_in:(g + 1) * group_in]
                    @ w[k, :, g * group_out:(g + 1) * group_out]
                )
    if b is not None:
        y += b
    return y


def conv_transpose1d_ref(x, w_flipped, b, stride, trim="causal"):
    """x: [T, Cin]; w_flipped: [K, Cin, Cout] pre-flipped like the JAX side,
    i.e. torch weight W[i, o, k] == w_flipped[K-1-k, i, o]. Computed directly
    from the torch definition y[js + k] += x[j] @ W[:, :, k]."""
    K, Cin, Cout = w_flipped.shape
    T = x.shape[0]
    full = (T - 1) * stride + K
    y = np.zeros((full, Cout))
    for j in range(T):
        for k in range(K):
            Wk = w_flipped[K - 1 - k]   # [Cin, Cout] == torch W[:, :, k]
            y[j * stride + k] += x[j] @ Wk
    cut = K - stride
    if cut > 0:
        y = y[:full - cut] if trim == "causal" else y[cut:full - cut]
    if b is not None:
        y += b
    return y


def snake_ref(x, alpha, beta):
    return x + np.exp(-np.asarray(beta, np.float64)) * np.sin(x * np.exp(np.asarray(alpha, np.float64))) ** 2


def layer_norm_ref(x, w, b, eps):
    mu = x.mean(-1, keepdims=True)
    var = ((x - mu) ** 2).mean(-1, keepdims=True)
    return (x - mu) / np.sqrt(var + eps) * w + b


def gelu_exact(x):
    from math import sqrt
    from scipy.special import erf  # scipy is available transitively; fallback below
    return 0.5 * x * (1.0 + erf(x / sqrt(2.0)))


def _gelu(x):
    try:
        return gelu_exact(x)
    except Exception:
        import math
        vec = np.vectorize(lambda v: 0.5 * v * (1.0 + math.erf(v / math.sqrt(2.0))))
        return vec(x)


def mha_rope_causal(x, p, li, n_heads, qkv_dim, eps, theta):
    T, W = x.shape
    D = qkv_dim // n_heads
    h = rms_norm(x, np.asarray(p.attn_norm[li], np.float64), eps)
    q = (h @ np.asarray(p.wq[li], np.float64)).reshape(T, n_heads, D)
    k = (h @ np.asarray(p.wk[li], np.float64)).reshape(T, n_heads, D)
    v = (h @ np.asarray(p.wv[li], np.float64)).reshape(T, n_heads, D)
    positions = np.arange(T)
    q = neox_rope(q, positions, theta)
    k = neox_rope(k, positions, theta)
    o = causal_attention(q, k, v, n_heads).reshape(T, qkv_dim)
    x = x + (o @ np.asarray(p.wo[li], np.float64)) * np.asarray(p.attn_scale[li], np.float64)
    h = rms_norm(x, np.asarray(p.ffn_norm[li], np.float64), eps)
    gate = silu(h @ np.asarray(p.w_gate[li], np.float64))
    up = h @ np.asarray(p.w_up[li], np.float64)
    x = x + ((gate * up) @ np.asarray(p.w_down[li], np.float64)) * np.asarray(p.ffn_scale[li], np.float64)
    return x


def vocoder_ref(vp, cfg, codes, trim="causal"):
    """codes: [T, 16] -> waveform [T * samples_per_frame]."""
    codes = np.asarray(codes)
    T = codes.shape[0]
    f64 = lambda a: np.asarray(a, np.float64)

    first = f64(vp.vq_first_cb)[codes[:, 0]]
    latent = first @ f64(vp.vq_first_proj)
    for cb in range(cfg.n_codebooks - 1):
        emb = f64(vp.vq_rest_cb)[cb][codes[:, cb + 1]]
        latent = latent + emb @ f64(vp.vq_rest_proj)

    x = conv1d_ref(latent, f64(vp.pre_conv_w), f64(vp.pre_conv_b), causal=True)
    x = x @ f64(vp.pt_in_w) + f64(vp.pt_in_b)
    for li in range(cfg.n_pre_tfm_layers):
        x = mha_rope_causal(x, vp.pt_blocks, li, cfg.n_heads, cfg.pre_tfm_qkv_dim,
                            cfg.rms_norm_eps, cfg.rope_theta)
    x = rms_norm(x, f64(vp.pt_norm), cfg.rms_norm_eps)
    x = x @ f64(vp.pt_out_w) + f64(vp.pt_out_b)

    for i in range(cfg.n_convnext):
        C = x.shape[1]
        x = conv_transpose1d_ref(x, f64(vp.convnext.convt_w[i]), f64(vp.convnext.convt_b[i]), 2, trim)
        res = x
        x = conv1d_ref(x, f64(vp.convnext.dw_w[i]), f64(vp.convnext.dw_b[i]), groups=C, causal=True)
        x = layer_norm_ref(x, f64(vp.convnext.ln_w[i]), f64(vp.convnext.ln_b[i]), 1e-6)
        x = x @ f64(vp.convnext.pw1_w[i]) + f64(vp.convnext.pw1_b[i])
        x = _gelu(x)
        x = x @ f64(vp.convnext.pw2_w[i]) + f64(vp.convnext.pw2_b[i])
        x = res + x * f64(vp.convnext.gamma[i])

    x = conv1d_ref(x, f64(vp.dec0_w), f64(vp.dec0_b), causal=True)
    for blk, rate in zip(vp.dec_blocks, cfg.upsample_rates):
        x = snake_ref(x, blk.snake_alpha, blk.snake_beta)
        x = conv_transpose1d_ref(x, f64(blk.convt_w), f64(blk.convt_b), rate, trim)
        for i, d in enumerate(cfg.res_dilations):
            r = x
            x = snake_ref(x, blk.res.act1_alpha[i], blk.res.act1_beta[i])
            x = conv1d_ref(x, f64(blk.res.conv1_w[i]), f64(blk.res.conv1_b[i]), dilation=d, causal=True)
            x = snake_ref(x, blk.res.act2_alpha[i], blk.res.act2_beta[i])
            x = conv1d_ref(x, f64(blk.res.conv2_w[i]), f64(blk.res.conv2_b[i]), causal=True)
            x = r + x

    x = snake_ref(x, vp.final_alpha, vp.final_beta)
    x = conv1d_ref(x, f64(vp.out_w), f64(vp.out_b), causal=True)
    return np.tanh(x[:, 0])


# --------------------------------------------------------------------------
# speaker encoder (ECAPA-TDNN) + mel front end
# --------------------------------------------------------------------------

def mel_ref(samples, cfg):
    """Direct transcription of audio_tokenizer_encoder.cpp:288-371 with an
    O(N^2)-equivalent DFT via np.fft (same math)."""
    samples = np.asarray(samples, np.float64)
    n = len(samples)
    pad = (cfg.n_fft - cfg.hop_length) // 2
    padded = np.empty(n + 2 * pad)
    for i in range(len(padded)):
        j = i - pad
        if j < 0:
            j = -j
        if j >= n:
            j = 2 * n - 2 - j
        padded[i] = samples[min(max(j, 0), n - 1)]
    n_frames = (len(padded) - cfg.n_fft) // cfg.hop_length + 1

    window = np.zeros(cfg.n_fft)
    off = (cfg.n_fft - cfg.win_length) // 2
    w = cfg.win_length
    window[off:off + w] = 0.5 * (1.0 - np.cos(2.0 * np.pi * np.arange(w) / w))

    from qwen3tts_tpu.audio.mel import slaney_mel_filterbank
    fb = np.asarray(slaney_mel_filterbank(cfg), np.float64)

    mel = np.zeros((n_frames, cfg.n_mels))
    for f in range(n_frames):
        frame = padded[f * cfg.hop_length: f * cfg.hop_length + cfg.n_fft] * window
        spec = np.fft.rfft(frame)
        mag = np.sqrt(spec.real ** 2 + spec.imag ** 2 + 1e-9)
        mel[f] = np.log(np.maximum(fb @ mag, 1e-5))
    return mel


def _conv_reflect_ref(x, w, b, dilation=1):
    """'Same' conv with reflect padding; x [T, Cin], w [K, Cin, Cout]."""
    K = w.shape[0]
    T = x.shape[0]
    if K == 1:
        return x @ w[0] + b
    pad = dilation * (K - 1) // 2
    xp = np.pad(x, ((pad, pad), (0, 0)), mode="reflect")
    y = np.zeros((T, w.shape[2]))
    for t in range(T):
        for k in range(K):
            y[t] += xp[t + k * dilation] @ w[k]
    return y + b


def relu(x):
    return np.maximum(x, 0.0)


def speaker_encoder_ref(p, cfg, mel):
    """Full-length (unmasked) ECAPA forward mirroring
    audio_tokenizer_encoder.cpp:445-701."""
    f64 = lambda a: np.asarray(a, np.float64)
    T = mel.shape[0]
    B = cfg.branch_dim
    x = relu(_conv_reflect_ref(np.asarray(mel, np.float64), f64(p.conv0_w), f64(p.conv0_b)))

    outputs = []
    for blk, dilation in zip(p.blocks, cfg.dilations):
        residual = x
        x = relu(_conv_reflect_ref(x, f64(blk.tdnn1_w), f64(blk.tdnn1_b)))
        branches = [x[:, i * B:(i + 1) * B] for i in range(cfg.res2net_scale)]
        outs = [branches[0]]
        for i in range(1, cfg.res2net_scale):
            inp = branches[i] if i == 1 else branches[i] + outs[-1]
            outs.append(relu(_conv_reflect_ref(inp, f64(blk.res2net_w[i - 1]),
                                               f64(blk.res2net_b[i - 1]), dilation)))
        x = np.concatenate(outs, axis=-1)
        x = relu(_conv_reflect_ref(x, f64(blk.tdnn2_w), f64(blk.tdnn2_b)))
        se = x.mean(axis=0)
        se = relu(se @ f64(blk.se1_w)[0] + f64(blk.se1_b))
        se = 1.0 / (1.0 + np.exp(-(se @ f64(blk.se2_w)[0] + f64(blk.se2_b))))
        x = x * se[None, :] + residual
        outputs.append(x)

    x = np.concatenate(outputs, axis=-1)
    x = relu(_conv_reflect_ref(x, f64(p.mfa_w), f64(p.mfa_b)))

    gmean = x.mean(axis=0)
    gvar = np.clip((x * x).mean(axis=0) - gmean ** 2, 1e-12, 1e10)
    gstd = np.sqrt(gvar)
    att_in = np.concatenate([x, np.tile(gmean, (T, 1)), np.tile(gstd, (T, 1))], axis=-1)
    att = relu(att_in @ f64(p.asp_tdnn_w)[0] + f64(p.asp_tdnn_b))
    att = np.tanh(att)
    att = att @ f64(p.asp_conv_w)[0] + f64(p.asp_conv_b)
    att = att - att.max(axis=0, keepdims=True)
    att = np.exp(att)
    att = att / att.sum(axis=0, keepdims=True)

    wmean = (att * x).sum(axis=0)
    wvar = np.clip((att * (x - wmean) ** 2).sum(axis=0), 1e-12, 1e10)
    wstd = np.sqrt(wvar)
    pooled = np.concatenate([wmean, wstd])
    return pooled @ f64(p.fc_w)[0] + f64(p.fc_b)


# ---------------------------------------------------------------------------
# on-kernel sampling noise (mirror of qwen3tts_tpu/ops/kernel_prng.py)
# ---------------------------------------------------------------------------

def gumbel_noise_ref(seed, step, shape):
    """uint32 NumPy mirror of ops/kernel_prng.gumbel_noise: same integer hash
    bit-for-bit (int32 wraparound == uint32 arithmetic), gumbel transform in
    float64 (the kernel uses f32 — agree to f32 precision, not bitwise).

    seed: int scalar or array broadcastable over rows; step: int.
    """
    GOLDEN = np.uint32(0x9E3779B9)
    M1 = np.uint32(0x85EBCA6B)
    M2 = np.uint32(0xC2B2AE35)

    def mix(x):
        x = x ^ (x >> np.uint32(16))
        x = (x * M1).astype(np.uint32)
        x = x ^ (x >> np.uint32(13))
        x = (x * M2).astype(np.uint32)
        return (x ^ (x >> np.uint32(16))).astype(np.uint32)

    v = np.broadcast_to(
        np.arange(shape[-1], dtype=np.uint32), shape).astype(np.uint32)
    seed_u = (np.asarray(seed, np.int64) & 0xFFFFFFFF).astype(np.uint32)
    with np.errstate(over="ignore"):   # uint32 wraparound is the point
        base = (seed_u
                + np.uint32(step & 0xFFFFFFFF) * GOLDEN).astype(np.uint32)
        x = mix((mix((v + base * M1).astype(np.uint32))
                 ^ base).astype(np.uint32))
    u = (x >> np.uint32(8)).astype(np.float64) * (1.0 / (1 << 24)) + 1e-12
    return -np.log(-np.log(u))
