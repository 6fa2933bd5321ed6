"""P1 glob-membership predicates — hand-written expectations (independent
of the generator/golden pipeline, per ADVICE r1 on self-certification)."""

from pyspark.sql import functions as F

from maxx_spark.operators.globber import glob_filter

ROOT = "matlab/toolbox"


def _urls(spark, rels):
    rows = [(f"https://h/{ROOT}/{rel}",) for rel in rels]
    return spark.createDataFrame(rows, "url string")


CASES = [
    # (relpath, recursive=False member?, recursive=True member?)
    ("f.m", True, True),
    ("Contents.m", False, False),  # Contents.m never a member
    ("f.mlx", "mlx", "mlx"),  # member only when parse_live_scripts
    ("f.txt", False, False),
    ("+pkg/f.m", True, True),  # +pkg always descended
    ("+pkg/+sub/f.m", True, True),
    ("@Cls/m.m", True, True),  # @Cls always descended
    ("@Cls/private/h.m", False, False),  # plain dir below a prefixed dir
    ("+pkg/helpers/f.m", False, False),  # plain dir below +pkg: never
    ("sub/f.m", False, True),  # plain dir: recursive only
    ("sub/deep/f.m", False, True),
    ("sub/+pkg/f.m", False, True),  # plain* then prefixed*: ok recursive
    ("sub/+pkg/other/f.m", False, False),  # plain after prefixed: never
    ("private/h.m", False, False),  # private dir: never, even recursive
    ("sub/private/h.m", False, False),
    ("privateer/f.m", False, True),  # 'privateer' is NOT 'private'
    ("sub/Contents.m", False, False),
]


def test_glob_membership_matrix(spark):
    rels = [c[0] for c in CASES]
    df = spark.createDataFrame([(r,) for r in rels], "rel string").withColumn(
        "url", F.concat(F.lit(f"https://h/{ROOT}/"), F.col("rel"))
    )
    for recursive, col in ((False, 1), (True, 2)):
        got = {
            r["rel"]
            for r in glob_filter(df, ROOT, recursive=recursive).collect()
        }
        want = {c[0] for c in CASES if c[col] is True}
        assert got == want, f"recursive={recursive}: {got ^ want}"
        # with parse_live_scripts, .mlx files join the member set
        got_mlx = {
            r["rel"]
            for r in glob_filter(
                df, ROOT, recursive=recursive, parse_live_scripts=True
            ).collect()
        }
        want_mlx = want | {c[0] for c in CASES if c[col] == "mlx"}
        assert got_mlx == want_mlx


def test_glob_outside_root_excluded(spark):
    df = spark.createDataFrame(
        [("https://h/other/place/f.m",), (f"https://h/{ROOT}/f.m",)], "url string"
    )
    got = [r["url"] for r in glob_filter(df, ROOT).collect()]
    assert got == [f"https://h/{ROOT}/f.m"]
