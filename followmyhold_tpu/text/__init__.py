from followmyhold_tpu.text.tokenizers import (
    ClipBpeTokenizer,
    UnigramTokenizer,
    WordPieceTokenizer,
    has_tokenizer,
    tokenizer_dir,
)

__all__ = [
    "WordPieceTokenizer",
    "ClipBpeTokenizer",
    "UnigramTokenizer",
    "tokenizer_dir",
    "has_tokenizer",
]
