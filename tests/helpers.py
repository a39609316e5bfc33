"""Shared test fixtures: tiny tokenizer + tiny random engine builders."""
import numpy as np

from auralis_tpu.frontend.tokenizer import TTSTokenizer


def build_tiny_tokenizer() -> TTSTokenizer:
    from tokenizers import Tokenizer, models, trainers

    tok = Tokenizer(models.BPE(unk_token="[UNK]"))
    trainer = trainers.BpeTrainer(
        vocab_size=380,
        special_tokens=["[PAD]", "[UNK]", "[START]", "[STOP]", "[SPACE]",
                        "[en]", "[es]", "[de]", "[fr]", "[it]", "[ja]", "[ko]",
                        "[zh-cn]", "[ru]", "[pt]", "[nl]", "[tr]", "[hu]",
                        "[pl]", "[cs]", "[ar]", "[hi]"],
    )
    corpus = [
        "hello[SPACE]world[SPACE]this[SPACE]is[SPACE]a[SPACE]test[SPACE]of[SPACE]speech",
        "the[SPACE]quick[SPACE]brown[SPACE]fox[SPACE]jumps[SPACE]over[SPACE]the[SPACE]dog",
        "one[SPACE]two[SPACE]three[SPACE]four[SPACE]five[SPACE]six[SPACE]seven",
        "abcdefghijklmnopqrstuvwxyz0123456789.,!?'",
    ]
    tok.train_from_iterator(corpus, trainer)
    return TTSTokenizer(tok)


def sine_wav(path, sr=22050, seconds=1.5, f0=220.0):
    from auralis_tpu.common import audio_io

    t = np.arange(int(sr * seconds)) / sr
    wav = (0.5 * np.sin(2 * np.pi * f0 * t) * (0.8 + 0.2 * np.sin(2 * np.pi * 2 * t))).astype(
        np.float32
    )
    audio_io.write_wav(path, wav, sr)
    return str(path)


def build_tiny_engine(seed: int = 0, max_concurrency: int = 4, **kwargs):
    from auralis_tpu.models.xttsv2.engine import XTTSv2Engine

    return XTTSv2Engine.random_init(
        tokenizer=build_tiny_tokenizer(), seed=seed, max_concurrency=max_concurrency,
        **kwargs,
    )


def export_coqui_state(gpt_params: dict, core: dict) -> dict:
    """Invert the weight-loader transforms (weights.py:load_gpt_params /
    load_core_params) to synthesize a Coqui-style flat state dict with the
    original checkpoint's key names and torch tensor layouts. Used by the
    golden round-trip test: random params -> Coqui .pth ->
    convert_coqui_checkpoint -> from_pretrained must reproduce the params
    bit-exactly (BN rows are emitted with mean=0 / var=1-eps so folding is
    the identity)."""
    st: dict = {}

    def P(key, value):
        st[key] = np.ascontiguousarray(np.asarray(value, np.float32))

    def bn(prefix, scale, shift):
        P(f"{prefix}.weight", scale)
        P(f"{prefix}.bias", shift)
        P(f"{prefix}.running_mean", np.zeros_like(np.asarray(scale)))
        P(f"{prefix}.running_var", np.full_like(np.asarray(scale, np.float64), 1.0 - 1e-5))

    inv1d = lambda w: np.transpose(np.asarray(w), (2, 1, 0))  # [K,I,O]->[O,I,K]
    invT1d = lambda w: np.transpose(np.asarray(w), (1, 2, 0))[:, :, ::-1]  # ->[I,O,K]
    inv2d = lambda w: np.transpose(np.asarray(w), (3, 2, 0, 1))  # [kh,kw,I,O]->[O,I,kh,kw]

    g = gpt_params
    P("gpt.mel_embedding.weight", g["wte"])
    P("gpt.mel_pos_embedding.emb.weight", g["wpe"])
    P("gpt.text_embedding.weight", g["text_wte"])
    P("gpt.text_pos_embedding.emb.weight", g["text_wpe"])
    P("gpt.mel_head.weight", np.asarray(g["mel_head_w"]).T)
    P("gpt.mel_head.bias", g["mel_head_b"])
    P("gpt.final_norm.weight", g["final_norm_scale"])
    P("gpt.final_norm.bias", g["final_norm_bias"])
    P("gpt.gpt.ln_f.weight", g["ln_f_scale"])
    P("gpt.gpt.ln_f.bias", g["ln_f_bias"])
    block_names = [
        ("ln_1.weight", "ln1_scale"), ("ln_1.bias", "ln1_bias"),
        ("attn.c_attn.weight", "attn_w"), ("attn.c_attn.bias", "attn_b"),
        ("attn.c_proj.weight", "attn_proj_w"), ("attn.c_proj.bias", "attn_proj_b"),
        ("ln_2.weight", "ln2_scale"), ("ln_2.bias", "ln2_bias"),
        ("mlp.c_fc.weight", "fc_w"), ("mlp.c_fc.bias", "fc_b"),
        ("mlp.c_proj.weight", "fc_proj_w"), ("mlp.c_proj.bias", "fc_proj_b"),
    ]
    n_layers = np.asarray(g["blocks"]["ln1_scale"]).shape[0]
    for i in range(n_layers):
        for torch_name, jax_name in block_names:
            P(f"gpt.gpt.h.{i}.{torch_name}", np.asarray(g["blocks"][jax_name])[i])

    ce = core["cond_encoder"]
    P("gpt.conditioning_encoder.init.weight", np.asarray(ce["init_w"]).T[:, :, None])
    P("gpt.conditioning_encoder.init.bias", ce["init_b"])
    for i, b in enumerate(ce["blocks"]):
        p = f"gpt.conditioning_encoder.attn.{i}"
        P(f"{p}.norm.weight", b["norm_scale"])
        P(f"{p}.norm.bias", b["norm_bias"])
        P(f"{p}.qkv.weight", np.asarray(b["qkv_w"]).T[:, :, None])
        P(f"{p}.qkv.bias", b["qkv_b"])
        P(f"{p}.proj_out.weight", np.asarray(b["proj_w"]).T[:, :, None])
        P(f"{p}.proj_out.bias", b["proj_b"])

    pv = core["perceiver"]
    P("gpt.conditioning_perceiver.latents", pv["latents"])
    P("gpt.conditioning_perceiver.norm.gamma", pv["norm_gamma"])
    for i, l in enumerate(pv["layers"]):
        p = f"gpt.conditioning_perceiver.layers.{i}"
        P(f"{p}.0.to_q.weight", np.asarray(l["attn"]["to_q"]).T)
        P(f"{p}.0.to_kv.weight", np.asarray(l["attn"]["to_kv"]).T)
        P(f"{p}.0.to_out.weight", np.asarray(l["attn"]["to_out"]).T)
        P(f"{p}.1.0.weight", np.asarray(l["ff"]["w1"]).T)
        P(f"{p}.1.0.bias", l["ff"]["b1"])
        P(f"{p}.1.2.weight", np.asarray(l["ff"]["w2"]).T)
        P(f"{p}.1.2.bias", l["ff"]["b2"])

    se = core["speaker_encoder"]
    sp = "hifigan_decoder.speaker_encoder"
    P(f"{sp}.conv1.weight", inv2d(se["conv1_w"]))
    P(f"{sp}.conv1.bias", se["conv1_b"])
    bn(f"{sp}.bn1", se["bn1_scale"], se["bn1_shift"])
    P(f"{sp}.attention.0.weight", np.asarray(se["att1_w"]).T[:, :, None])
    P(f"{sp}.attention.0.bias", se["att1_b"])
    bn(f"{sp}.attention.2", se["att_bn_scale"], se["att_bn_shift"])
    P(f"{sp}.attention.3.weight", np.asarray(se["att2_w"]).T[:, :, None])
    P(f"{sp}.attention.3.bias", se["att2_b"])
    P(f"{sp}.fc.weight", np.asarray(se["fc_w"]).T)
    P(f"{sp}.fc.bias", se["fc_b"])
    for li in range(1, 5):
        for j, blk in enumerate(se[f"layer{li}"]):
            p = f"{sp}.layer{li}.{j}"
            P(f"{p}.conv1.weight", inv2d(blk["conv1_w"]))
            bn(f"{p}.bn1", blk["bn1_scale"], blk["bn1_shift"])
            P(f"{p}.conv2.weight", inv2d(blk["conv2_w"]))
            bn(f"{p}.bn2", blk["bn2_scale"], blk["bn2_shift"])
            P(f"{p}.se.fc.0.weight", np.asarray(blk["se"]["fc1_w"]).T)
            P(f"{p}.se.fc.0.bias", blk["se"]["fc1_b"])
            P(f"{p}.se.fc.2.weight", np.asarray(blk["se"]["fc2_w"]).T)
            P(f"{p}.se.fc.2.bias", blk["se"]["fc2_b"])
            if "down_w" in blk:
                P(f"{p}.downsample.0.weight", inv2d(blk["down_w"]))
                bn(f"{p}.downsample.1", blk["down_bn_scale"], blk["down_bn_shift"])

    hg = core["hifigan"]
    hp = "hifigan_decoder.waveform_decoder"
    P(f"{hp}.conv_pre.weight", inv1d(hg["conv_pre_w"]))
    P(f"{hp}.conv_pre.bias", hg["conv_pre_b"])
    P(f"{hp}.cond_layer.weight", np.asarray(hg["cond_w"]).T[:, :, None])
    P(f"{hp}.cond_layer.bias", hg["cond_b"])
    for i, u in enumerate(hg["ups"]):
        P(f"{hp}.ups.{i}.weight", invT1d(u["w"]))
        P(f"{hp}.ups.{i}.bias", u["b"])
    for i, c in enumerate(hg["conds"]):
        P(f"{hp}.conds.{i}.weight", np.asarray(c["w"]).T[:, :, None])
        P(f"{hp}.conds.{i}.bias", c["b"])
    for i, r in enumerate(hg["resblocks"]):
        for group in ("convs1", "convs2"):
            for j, cv in enumerate(r[group]):
                P(f"{hp}.resblocks.{i}.{group}.{j}.weight", inv1d(cv["w"]))
                P(f"{hp}.resblocks.{i}.{group}.{j}.bias", cv["b"])
    P(f"{hp}.conv_post.weight", inv1d(hg["conv_post_w"]))
    P("mel_stats", core["mel_stats"])
    return st
