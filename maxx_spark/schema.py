"""Fixed schemas of the engine (SURVEY.md §1.2).

``PAGES`` is the input stream shape mandated by BASELINE.json's input_hint:
Common-Crawl-style web pages. ``CODE_UNITS`` is the output: one row per
parsed MATLAB code unit (the flattened closure of the reference's object
graph — reference: /root/reference/src/maxx/objects.py:192-266 for the node
fields, treesitter.py:342-406 for the per-file dispatch).
"""

from __future__ import annotations

from pyspark.sql.types import (
    ArrayType,
    BinaryType,
    BooleanType,
    IntegerType,
    MapType,
    StringType,
    StructField,
    StructType,
    TimestampType,
)

PAGES = StructType(
    [
        StructField("url", StringType(), False),
        StructField("warc_ts", TimestampType(), False),
        StructField("html", BinaryType(), True),
        StructField("text", StringType(), True),
        StructField("lang", StringType(), True),
    ]
)

ARGUMENT = StructType(
    [
        StructField("name", StringType(), False),
        # positional_only | optional | keyword_only | varargin
        # (reference enums.py:36-50)
        StructField("arg_kind", StringType(), True),
        StructField("type", StringType(), True),
        StructField("dimensions", ArrayType(StringType()), True),
        StructField("validators", StringType(), True),
        StructField("default", StringType(), True),
        StructField("docstring", StringType(), True),
    ]
)

SECTION = StructType(
    [
        StructField("section_kind", StringType(), False),  # code | text
        StructField("content", StringType(), True),
    ]
)

CODE_UNITS = StructType(
    [
        StructField("url", StringType(), False),
        StructField("warc_ts", TimestampType(), True),
        # canonical dotted path, e.g. "+pkg.Cls.method1"
        StructField("unit_path", StringType(), True),
        # folder|namespace|class|function|script|property|enumeration|live_script|error
        StructField("kind", StringType(), True),
        StructField("name", StringType(), True),
        StructField("parent_path", StringType(), True),
        StructField("lineno", IntegerType(), True),
        StructField("endlineno", IntegerType(), True),
        StructField("docstring", StringType(), True),
        StructField("docstring_lineno", IntegerType(), True),
        StructField("docstring_endlineno", IntegerType(), True),
        StructField("bases", ArrayType(StringType()), True),
        StructField("attributes", MapType(StringType(), StringType()), True),
        StructField("arguments", ArrayType(ARGUMENT), True),
        StructField("returns", ArrayType(ARGUMENT), True),
        StructField("sections", ArrayType(SECTION), True),
        # byte-identity column: dedented source slice lines[lineno-1:endlineno]
        StructField("extracted_text", StringType(), True),
        # privacy predicates as first-class columns (P30; reference
        # mixins.py:200-207: any path part == 'private' / '+internal')
        StructField("is_private", BooleanType(), True),
        StructField("is_internal", BooleanType(), True),
        StructField("error", StringType(), True),
    ]
)
