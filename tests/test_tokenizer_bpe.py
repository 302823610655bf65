"""Real-BPE tokenizer tests against the GENUINE transformers CLIPTokenizer.

VERDICT r1 item 9: the BPE path of utils/tokenizer.py had never seen a real
vocab. Here a small but structurally real vocab.json/merges.txt fixture is
generated (full 256-symbol byte alphabet, </w> word-final variants, a real
merge table, CLIP special tokens) and BOTH tokenizers load the same files:
ours and transformers.CLIPTokenizer — the exact class the reference uses
(/root/reference/elastic_diffusion.py:249-250, padding='max_length',
max_length=77, truncation=True). input_ids must match token for token.

ftfy is not installed, so transformers uses its BasicTokenizer cleaning path;
prompts here avoid HTML entities (the one cleaning difference vs our
double-html.unescape, which mirrors the original CLIP/ftfy convention).
"""

import json
import os

import numpy as np
import pytest

from elasticdiffusion_tpu.utils.tokenizer import CLIPTokenizer, _bytes_to_unicode


MERGES = [
    # words
    ("h", "e"), ("he", "l"), ("hel", "l"), ("hell", "o</w>"),
    ("w", "o"), ("wo", "r"), ("wor", "l"), ("worl", "d</w>"),
    ("p", "h"), ("ph", "o"), ("pho", "t"), ("phot", "o</w>"),
    ("o", "f</w>"), ("a", "</w>"), ("t", "h"), ("th", "e</w>"),
    ("c", "a"), ("ca", "t</w>"), ("d", "o"), ("do", "g</w>"),
    # partial merges that can leave multi-token words
    ("i", "n"), ("in", "g</w>"), ("r", "un"),  # ("r","un") never applies: 'un' unreachable
    ("u", "n"), ("s", "</w>"),
    # punctuation / contraction pieces
    ("'", "s</w>"), ("!", "!</w>"), ("1", "</w>"),
]


@pytest.fixture(scope="module")
def vocab_dir(tmp_path_factory):
    d = tmp_path_factory.mktemp("clip_vocab")
    byte_syms = list(_bytes_to_unicode().values())
    vocab = {}
    for s in byte_syms:
        vocab[s] = len(vocab)
    for s in byte_syms:
        vocab[s + "</w>"] = len(vocab)
    for a, b in MERGES:
        tok = a + b
        if tok not in vocab:
            vocab[tok] = len(vocab)
    vocab["<|startoftext|>"] = len(vocab)
    vocab["<|endoftext|>"] = len(vocab)
    with open(d / "vocab.json", "w") as f:
        json.dump(vocab, f)
    with open(d / "merges.txt", "w") as f:
        f.write("#version: 0.2\n")
        f.writelines(f"{a} {b}\n" for a, b in MERGES)
    return str(d)


@pytest.fixture(scope="module")
def hf_tok(vocab_dir):
    import transformers
    return transformers.CLIPTokenizer(
        os.path.join(vocab_dir, "vocab.json"),
        os.path.join(vocab_dir, "merges.txt"),
        model_max_length=77)


@pytest.fixture(scope="module")
def our_tok(vocab_dir):
    return CLIPTokenizer(vocab_dir=vocab_dir)


PROMPTS = [
    "hello world",
    "a photo of the cat",
    "A PHOTO OF THE DOG",                      # case folding
    "hello    world   ",                       # whitespace cleanup
    "the cat's hello!!",                       # contraction + punct merge
    "running things",                          # partial merges, unk-free tails
    "1 2 3 hello 1",                           # digits (single-char tokens)
    "naïve café emoji 😀",                     # multi-byte utf-8
    "word " * 60,                              # > 77 tokens: truncation
    "",                                        # empty prompt
    "the <|endoftext|> in text",               # special token inside text
]


@pytest.mark.parametrize("prompt", PROMPTS)
def test_input_ids_match_transformers(hf_tok, our_tok, prompt):
    want = hf_tok([prompt], padding="max_length", max_length=77,
                  truncation=True).input_ids
    got = our_tok([prompt])
    np.testing.assert_array_equal(got, np.asarray(want, np.int32))


def test_batch_and_special_ids(hf_tok, our_tok):
    got = our_tok(["hello world", "the cat"])
    assert got.shape == (2, 77)
    assert our_tok.bos_token_id == hf_tok.bos_token_id
    assert our_tok.eos_token_id == hf_tok.eos_token_id
    assert our_tok.pad_token_id == hf_tok.pad_token_id
    # BOS first, EOS terminates, EOS-padding after (SD1.x/2.x convention)
    assert (got[:, 0] == our_tok.bos_token_id).all()
    assert (got[0, -1] == our_tok.pad_token_id)


def test_xl_pad_token_zero(vocab_dir):
    """SDXL tokenizer_2 pads with id 0 (the '!' token), not EOS."""
    tok = CLIPTokenizer(vocab_dir=vocab_dir, pad_token_id=0)
    out = tok(["hello"])
    assert out[0, 0] == tok.bos_token_id
    assert out[0, 2] == tok.eos_token_id
    assert (out[0, 3:] == 0).all()
