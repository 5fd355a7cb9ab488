"""Engine-pinned whitespace tokenization.

Java regex ``\\s`` matches ``[ \\t\\n\\x0B\\f\\r]`` (includes vertical tab)
while RE2 — DuckDB's regex engine — matches ``[\\t\\n\\f\\r ]`` (excludes
it), so any Spark/DuckDB twin that splits on ``\\s+`` tokenizes a document
containing ``\\x0B`` differently across engines and breaks the hash-match
(round-7 ADVICE).  Every tokenizer twin in this repo therefore splits on
the explicit class below — the identical byte set in BOTH engines.

``TOKEN_DELIM_RE`` is a plain regex source string usable verbatim in
``F.split``/``F.regexp_replace`` (Java) and, embedded in a single-quoted
SQL literal, in ``string_split_regex``/``regexp_replace`` (RE2): DuckDB
single-quoted strings pass backslashes through untouched, so the escape
sequences reach RE2 intact.
"""

from __future__ import annotations

#: One canonical delimiter class for both engines (see module docstring).
TOKEN_DELIM_RE = r"[ \t\n\x0B\f\r]+"
