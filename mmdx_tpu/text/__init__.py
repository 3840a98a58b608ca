"""Host-side tokenizers: native WordPiece (BERT-compatible) + T5-style subword."""
