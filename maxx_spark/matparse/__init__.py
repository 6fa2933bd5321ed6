"""Pure-Python MATLAB source extraction (Layer P of SURVEY.md §2).

A from-scratch line/statement-oriented structural parser for MATLAB source:
functions, classdefs (properties / methods / enumeration blocks, attributes,
getter/setter linking), scripts, ``arguments`` blocks, docstring
normalization (pragma filtering, %{ %} block comments, %% headers, gap
splitting, dedent), and live scripts (plain-text %% format and binary .mlx
ZIP/OOXML).

Semantics re-derived from the observable behavior of the reference
(watermarkhu/maxx: treesitter.py:342-893, livescript.py, collection.py) —
the implementation is an independent statement scanner, not a CST walker,
designed to run vectorized inside Arrow batches on Spark workers with no
native dependencies.
"""

from maxx_spark.matparse.mparser import (  # noqa: F401
    ExtractConfig,
    parse_mfile,
)
from maxx_spark.matparse.livescript import (  # noqa: F401
    is_binary_mlx,
    parse_mlx_bytes,
    parse_plaintext_livescript,
)
