"""Engine-owned MATLAB builtins dimension + expression doc links (P32).

The reference resolves the first identifier of any expression (class base,
property default, enum value, argument default) against a builtins table
and emits a MathWorks doc URL (expressions.py:29-53; the public URL scheme
is ``https://www.mathworks.com/help/matlab/ref/<name-lowercased>.html``).
This table is engine-owned: the names below are well-known public MATLAB
functions/classes written from general knowledge — it is deliberately NOT
the reference's bundled table.

``link_builtin_exprs`` keeps everything JVM-side: quoted strings are
stripped, identifiers token-split with ``regexp_extract_all``, posexploded
and equi-joined against the broadcast dim; the first (lowest-position)
builtin per expression wins — one broadcast join, no Python, no skew.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

MATHWORKS_DOC_URL = "https://www.mathworks.com/help/matlab"

# Well-known MATLAB builtins (public knowledge; grouped roughly by topic).
BUILTIN_NAMES: list[str] = [
    # language / types
    "double", "single", "int8", "int16", "int32", "int64", "uint8", "uint16",
    "uint32", "uint64", "logical", "char", "string", "cell", "struct",
    "table", "timetable", "categorical", "datetime", "duration",
    "calendarDuration", "containers", "dictionary", "function_handle",
    "handle", "enumeration", "matlab", "missing", "NaN", "nan", "Inf", "inf",
    "pi", "eps", "intmax", "intmin", "realmax", "realmin", "true", "false",
    # construction / inspection
    "zeros", "ones", "eye", "rand", "randn", "randi", "randperm", "linspace",
    "logspace", "colon", "meshgrid", "ndgrid", "size", "numel", "length",
    "ndims", "isempty", "isscalar", "isvector", "ismatrix", "isrow",
    "iscolumn", "isa", "class", "isnumeric", "islogical", "ischar",
    "isstring", "iscell", "isstruct", "istable", "isreal", "isnan", "isinf",
    "isfinite", "isfield", "isprop", "ismethod", "isobject", "exist",
    "validateattributes", "mustBePositive", "mustBeNegative",
    "mustBeNonnegative", "mustBeNonpositive", "mustBeFinite", "mustBeReal",
    "mustBeNumeric", "mustBeNonempty", "mustBeMember", "mustBeInteger",
    "mustBeInRange", "mustBeText", "mustBeTextScalar", "mustBeA",
    "mustBeFloat", "mustBeVector", "mustBeNonzero", "mustBeNonNan",
    # math
    "abs", "sign", "sqrt", "exp", "log", "log2", "log10", "log1p", "expm1",
    "sin", "cos", "tan", "asin", "acos", "atan", "atan2", "sinh", "cosh",
    "tanh", "asinh", "acosh", "atanh", "hypot", "mod", "rem", "floor",
    "ceil", "round", "fix", "gcd", "lcm", "factorial", "nchoosek", "primes",
    "factor", "power", "nthroot", "real", "imag", "conj", "angle", "complex",
    # linear algebra
    "mtimes", "times", "plus", "minus", "rdivide", "ldivide", "mldivide",
    "mrdivide", "transpose", "ctranspose", "inv", "pinv", "det", "rank",
    "trace", "norm", "eig", "svd", "qr", "lu", "chol", "expm", "logm",
    "sqrtm", "kron", "cross", "dot", "null", "orth", "cond", "linsolve",
    # reductions / statistics
    "sum", "prod", "cumsum", "cumprod", "cummax", "cummin", "diff", "max",
    "min", "mean", "median", "mode", "std", "var", "bounds", "rms",
    "movmean", "movsum", "movmax", "movmin", "movmedian", "movstd", "movvar",
    "histcounts", "histogram", "accumarray", "normalize", "rescale",
    "corrcoef", "cov", "quantile", "prctile",
    # arrays / manipulation
    "reshape", "permute", "ipermute", "squeeze", "repmat", "repelem", "cat",
    "horzcat", "vertcat", "flip", "fliplr", "flipud", "rot90", "circshift",
    "sort", "sortrows", "issorted", "unique", "union", "intersect",
    "setdiff", "setxor", "ismember", "find", "any", "all", "nnz", "nonzeros",
    "triu", "tril", "diag", "blkdiag", "end", "sub2ind", "ind2sub",
    "filloutliers", "rmoutliers", "fillmissing", "rmmissing", "ismissing",
    # strings
    "strcmp", "strcmpi", "strncmp", "strncmpi", "strcat", "strsplit",
    "strjoin", "strtrim", "strrep", "strfind", "sprintf", "sscanf", "upper",
    "lower", "pad", "strip", "split", "join", "contains", "startsWith",
    "endsWith", "extractBefore", "extractAfter", "extractBetween", "insertBefore",
    "insertAfter", "replace", "erase", "reverse", "num2str", "str2num",
    "str2double", "int2str", "mat2str", "compose", "regexp", "regexpi",
    "regexprep", "regexptranslate", "blanks", "newline", "deblank",
    # cells / structs / funcs
    "cellfun", "arrayfun", "structfun", "cell2mat", "mat2cell", "num2cell",
    "cell2struct", "struct2cell", "struct2table", "table2struct",
    "table2array", "array2table", "cell2table", "table2cell", "fieldnames",
    "getfield", "setfield", "rmfield", "orderfields", "deal", "feval",
    "func2str", "str2func", "nargin", "nargout", "narginchk", "nargoutchk",
    "varargin", "varargout", "inputParser", "inputname",
    # control / errors
    "error", "warning", "assert", "try", "catch", "rethrow", "throw",
    "MException", "lasterr", "onCleanup", "dbstack", "keyboard", "pause",
    "disp", "display", "fprintf", "input", "menu",
    # objects / meta
    "properties", "methods", "events", "metaclass", "superclasses",
    "isequal", "isequaln", "eq", "ne", "lt", "gt", "le", "ge", "not", "and",
    "or", "xor", "bitand", "bitor", "bitxor", "bitshift", "bitcmp",
    "typecast", "cast", "swapbytes",
    # files / io
    "fopen", "fclose", "fread", "fwrite", "fgetl", "fgets", "fscanf",
    "fseek", "ftell", "frewind", "fileread", "filewrite", "readtable",
    "writetable", "readmatrix", "writematrix", "readcell", "writecell",
    "readlines", "load", "save", "matfile", "importdata", "csvread",
    "csvwrite", "dlmread", "dlmwrite", "textscan", "exist", "dir", "ls",
    "pwd", "cd", "mkdir", "rmdir", "delete", "copyfile", "movefile",
    "fullfile", "fileparts", "filesep", "pathsep", "tempdir", "tempname",
    "exist", "which", "path", "addpath", "rmpath", "genpath", "restoredefaultpath",
    "jsonencode", "jsondecode", "webread", "webwrite", "websave", "urlread",
    # graphics (commonly referenced in defaults)
    "figure", "axes", "axis", "plot", "plot3", "scatter", "scatter3", "bar",
    "barh", "surf", "mesh", "contour", "contourf", "imagesc", "image",
    "pcolor", "colorbar", "colormap", "caxis", "clim", "xlabel", "ylabel",
    "zlabel", "title", "legend", "grid", "hold", "subplot", "tiledlayout",
    "nexttile", "xlim", "ylim", "zlim", "gca", "gcf", "clf", "close",
    "drawnow", "saveas", "exportgraphics", "annotation", "text", "line",
    "rectangle", "patch", "fill", "quiver", "stairs", "stem", "area",
    "errorbar", "boxchart", "heatmap", "histogram2", "polarplot",
    # time / misc
    "tic", "toc", "cputime", "clock", "now", "date", "datestr", "datenum",
    "datevec", "calmonths", "caldays", "years", "days", "hours", "minutes",
    "seconds", "milliseconds", "weekday", "eomday", "leapyear",
    "rng", "gpuArray", "gather", "parfor", "parfeval", "spmd", "batch",
    "interp1", "interp2", "interp3", "interpn", "griddata", "spline",
    "pchip", "ppval", "polyfit", "polyval", "roots", "poly", "conv",
    "deconv", "filter", "filtfilt", "fft", "ifft", "fft2", "ifft2", "fftn",
    "ifftn", "fftshift", "ifftshift", "conv2", "convn", "xcorr", "smoothdata",
    "ode45", "ode23", "ode113", "ode15s", "ode23s", "odeset", "fzero",
    "fminsearch", "fminbnd", "integral", "integral2", "integral3", "trapz",
    "cumtrapz", "gradient", "del2", "sparse", "full", "spalloc", "speye",
    "sprand", "sprandn", "spones", "issparse", "spy",
]


def all_builtin_names() -> list[str]:
    """Core + extended engine-owned names (builtins_names.py widens the
    dim toward the reference's coverage; still a few tens of KB)."""
    from maxx_spark.operators.builtins_names import COVERAGE_NAMES, EXTENDED_NAMES

    return sorted(set(BUILTIN_NAMES) | set(EXTENDED_NAMES) | set(COVERAGE_NAMES))


def builtins_dim(spark) -> DataFrame:
    """(builtin_name, doc_url) dimension — tiny, always broadcast."""
    rows = sorted(
        {(n, f"{MATHWORKS_DOC_URL}/ref/{n.lower()}.html") for n in all_builtin_names()}
    )
    return spark.createDataFrame(rows, "builtin_name string, doc_url string")


def _expr_sites(units: DataFrame) -> DataFrame:
    """(host, unit_path, site, expr) for every doc-linkable expression:
    class bases, property defaults, enum values, argument defaults."""
    from maxx_spark.operators.codeunits import with_host

    u = with_host(units)
    bases = u.where(F.col("kind") == "class").select(
        "host", "unit_path", F.lit("base").alias("site"), F.explode("bases").alias("expr")
    )
    prop_defaults = u.where(
        (F.col("kind") == "property") & F.col("attributes")["default"].isNotNull()
    ).select(
        "host", "unit_path", F.lit("property_default").alias("site"),
        F.col("attributes")["default"].alias("expr"),
    )
    enum_values = u.where(
        (F.col("kind") == "enumeration") & F.col("attributes")["value"].isNotNull()
    ).select(
        "host", "unit_path", F.lit("enum_value").alias("site"),
        F.col("attributes")["value"].alias("expr"),
    )
    arg_defaults = (
        u.where((F.col("kind") == "function") & F.col("arguments").isNotNull())
        .select("host", "unit_path", F.explode("arguments").alias("a"))
        .where(F.col("a.default").isNotNull())
        .select(
            "host", "unit_path", F.lit("argument_default").alias("site"),
            F.col("a.default").alias("expr"),
        )
    )
    return bases.unionByName(prop_defaults).unionByName(enum_values).unionByName(arg_defaults)


def link_builtin_exprs(units: DataFrame, builtins: DataFrame) -> DataFrame:
    """P32 generalized: first builtin identifier of each expression → doc
    link (reference Expr.doc, expressions.py:48-53). Emits
    (host, unit_path, site, expr, builtin_name, doc_url) for hits only."""
    sites = _expr_sites(units)
    # strip quoted strings, then token-split identifiers in order. MATLAB
    # escapes a quote inside a string by DOUBLING it ('it''s', "say ""hi""")
    # — the naive '[^']*' would close at the first inner quote and leak the
    # string tail as identifier tokens; (?:[^']|'')* consumes doubled
    # quotes so the whole literal strips. A trailing % comment (legal after
    # a default expression) is stripped AFTER strings, so a % inside a
    # string can't truncate the expression.
    cleaned = F.regexp_replace(
        F.regexp_replace(
            F.regexp_replace(F.col("expr"), r"'(?:[^']|'')*'", " "),
            r'"(?:[^"]|"")*"',
            " ",
        ),
        r"%.*",
        " ",
    )
    toks = sites.select(
        "host", "unit_path", "site", "expr",
        F.posexplode(
            F.regexp_extract_all(cleaned, F.lit(r"([A-Za-z_][A-Za-z0-9_]*)"), 1)
        ).alias("pos", "ident"),
    )
    hits = toks.join(F.broadcast(builtins), toks.ident == builtins.builtin_name)
    w = Window.partitionBy("host", "unit_path", "site", "expr").orderBy("pos")
    return (
        hits.withColumn("__rn", F.row_number().over(w))
        .where(F.col("__rn") == 1)
        .select("host", "unit_path", "site", "expr", "builtin_name", "doc_url")
    )
