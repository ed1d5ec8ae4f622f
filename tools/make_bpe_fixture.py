"""Generate the committed BPE test fixture (tests/fixtures/bpe/).

Writes a small CLIP-layout merges file + the matching vocab.json so the
parity test can load the SAME data into BOTH our ``SimpleTokenizer`` and
HuggingFace's independent ``transformers.CLIPTokenizer`` implementation and
compare token ids exactly. The merge list covers common English bigrams so
realistic words actually exercise the merge loop.

Vocab layout (CLIP convention): 256 byte-unicode chars, the same 256 with
'</w>', one token per merge, then <|startoftext|>, <|endoftext|>.
"""
import gzip
import json
import pathlib


def bytes_to_unicode():
    bs = (list(range(ord("!"), ord("~") + 1))
          + list(range(ord("\xa1"), ord("\xac") + 1))
          + list(range(ord("\xae"), ord("\xff") + 1)))
    cs = bs[:]
    n = 0
    for b in range(256):
        if b not in bs:
            bs.append(b)
            cs.append(256 + n)
            n += 1
    return dict(zip(bs, (chr(c) for c in cs)))


MERGES = [
    # frequent English pairs; '</w>' marks word-final units
    ("t", "h"), ("th", "e</w>"), ("i", "n"), ("a", "n"), ("e", "r"),
    ("o", "n"), ("r", "e"), ("a", "t"), ("e", "n"), ("o", "r"),
    ("s", "t"), ("a", "r"), ("o", "u"), ("i", "t"), ("an", "d</w>"),
    ("in", "g</w>"), ("er", "</w>"), ("a</w>", ""), ("o", "f</w>"),
    ("t", "o</w>"), ("i", "s</w>"), ("h", "e"), ("he", "l"), ("hel", "l"),
    ("hell", "o</w>"), ("w", "o"), ("wo", "r"), ("wor", "l"),
    ("worl", "d</w>"), ("p", "h"), ("ph", "o"), ("pho", "t"),
    ("phot", "o</w>"), ("c", "i"), ("ci", "t"), ("cit", "y</w>"),
    ("b", "u"), ("bu", "i"), ("bui", "l"), ("buil", "d"),
    ("build", "ing</w>"), ("s", "tre"), ("stre", "et</w>"),
    ("e", "t</w>"), ("t", "re"), ("1", "2"), ("12", "3</w>"),
    ("'", "s</w>"), (".", "</w>"), (",", "</w>"),
]
# drop malformed pairs (empty sides) — keep the generator honest
MERGES = [m for m in MERGES if m[0] and m[1]]


def main():
    root = (pathlib.Path(__file__).resolve().parent.parent
            / "tests" / "fixtures" / "bpe")
    root.mkdir(parents=True, exist_ok=True)
    byte_vocab = list(bytes_to_unicode().values())
    vocab = byte_vocab + [v + "</w>" for v in byte_vocab]
    for a, b in MERGES:
        vocab.append(a + b)
    vocab += ["<|startoftext|>", "<|endoftext|>"]
    merges_text = "bpe fixture v1\n" + "\n".join(f"{a} {b}" for a, b in MERGES)
    (root / "merges.txt").write_text(merges_text, encoding="utf-8")
    with gzip.open(root / "merges.txt.gz", "wb") as f:
        f.write(merges_text.encode("utf-8"))
    (root / "vocab.json").write_text(
        json.dumps({v: i for i, v in enumerate(vocab)}, ensure_ascii=False),
        encoding="utf-8",
    )
    print(f"fixture written to {root} ({len(vocab)} vocab entries)")


if __name__ == "__main__":
    main()
