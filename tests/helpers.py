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


def build_tiny_engine(seed: int = 0, max_concurrency: int = 4):
    from auralis_tpu.models.xttsv2.engine import XTTSv2Engine

    return XTTSv2Engine.random_init(
        tokenizer=build_tiny_tokenizer(), seed=seed, max_concurrency=max_concurrency
    )
