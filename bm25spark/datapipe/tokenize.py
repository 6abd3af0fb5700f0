"""The shared engine-portable pre-tokenizer for corpus-statistics
operators (BPE training, LM perplexity): lowercase, then extract
``[a-z0-9]+`` runs — JVM ``lower`` + ``regexp_extract_all``, Python
``re.findall``, and DuckDB ``regexp_extract_all`` all produce
identical runs, which is what lets one DuckDB oracle pin a whole
training loop. Tweaks happen HERE, once, or Spark/oracle parity
silently diverges between operators."""

from __future__ import annotations

WORD_RE = "[a-z0-9]+"


def words_expr(text_col: str) -> str:
    """Spark SQL expression producing the token array for a row."""
    return f"regexp_extract_all(lower({text_col}), '{WORD_RE}', 0)"


def words_sql(text_col: str = "text") -> str:
    """The DuckDB-side twin (no third flags argument)."""
    return f"regexp_extract_all(lower({text_col}), '{WORD_RE}')"


def words_py(text: str) -> list[str]:
    """The Python reference twin (independent trainers/oracles)."""
    import re

    return re.findall(WORD_RE, text.lower())
