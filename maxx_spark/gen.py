"""Deterministic synthetic `pages` generator (FIXTURES.md shape).

Generates Common-Crawl-style rows (url, warc_ts, html, text, lang) whose
MATLAB payloads exercise every extraction feature (functions with
arguments blocks, classes with properties/methods/enums, namespaces
``+pkg``, class folders ``@Cls``, ``private/`` dirs, scripts, live scripts,
block comments, pragmas, malformed files) plus non-MATLAB filler pages.

All content here is written from scratch for this engine (it mirrors the
*feature coverage* of the reference corpus, not its text). Seeded and
deterministic: same args → same rows.

Scale knobs: ``skew_host_frac`` routes a fraction of rows to one mega-host
(exercises salted repartition); ``ooo_frac`` emits out-of-order warc_ts;
``late_frac`` emits rows later than the watermark.
"""

from __future__ import annotations

import datetime as dt
import random

from pyspark.sql import DataFrame, SparkSession

from maxx_spark.schema import PAGES

EPOCH = dt.datetime(2024, 3, 1, 0, 0, 0)

# ---------------------------------------------------------------------------
# hand-written MATLAB corpus (feature parity with the reference's fixtures)
# ---------------------------------------------------------------------------

FN_WITH_ARGS = """\
function [total] = accumulate(series, weight, opts)
% Accumulate a weighted series into a scalar total.
% Demonstrates arguments-block extraction end to end.

    arguments
        series (1,:) double
            % Input series to accumulate
        weight double {mustBeNonnegative} = 1
            % Per-element weight applied before the sum
        opts.mode string = "linear"
            % Accumulation mode selector
    end

    total = sum(series) * weight;
    disp(opts.mode);
end
"""

CLS_BASIC = """\
classdef Tracker < handle
% A value tracker with history.
% Exercises property, constructor, and method extraction.
%
% Properties:
%   Current - present value
%   History - all past values

    properties
        Current double = 0
        History (1,:) double = []
    end

    methods
        function obj = Tracker(start_val)
            % Tracker constructor
            % Seeds the current value

            arguments
                start_val double {mustBeFinite} = 0
                    % Starting value for the tracker
            end

            obj.Current = start_val;
        end

        function out = advance(obj, step)
            % Advance the tracker by a step

            arguments
                obj
                step (1,1) double {mustBeReal}
                    % Increment added to the current value
            end

            obj.History(end+1) = obj.Current;
            out = obj.Current + step;
        end
    end

    methods (Access = private)
        function reset(obj, opts)
            % Reset the tracker state

            arguments
                obj
                opts.keep_history (1,1) logical = false
                    % Whether history survives the reset
            end

            if ~opts.keep_history
                obj.History = [];
            end
            obj.Current = 0;
        end
    end
end
"""

CLS_ATTRS = """\
classdef (Abstract, Sealed) Shape < handle
    % Abstract sealed shape base
    % Exercises class/property/method attribute extraction

    properties (Abstract)
        Area
    end

    properties (Hidden)
        CacheSlot = 7
        Thumbnail = imread('logo.png')
    end

    properties (Constant)
        Kind = 'shape'
    end

    properties (Access = protected)
        Guard = 0
    end

    properties (SetAccess = private)
        Tag = 'fixed'
    end

    methods (Static)
        function y = unit(x)
            % Unit scaling helper
            y = x * 1;
        end
    end

    methods (Hidden)
        function flag = ghost(obj)
            % Hidden method
            flag = true;
        end
    end
end
"""

CLS_GETSET = """\
classdef Meter < handle
    % Meter with a derived reading

    properties (Dependent)
        Reading
    end

    properties (Access = private)
        RawValue = 0
    end

    methods
        function value = get.Reading(obj)
            % Getter for Reading
            value = obj.RawValue * 10;
        end

        function set.Reading(obj, value)
            % Setter for Reading
            obj.RawValue = value / 10;
        end
    end
end
"""

ENUM_CLS = """\
classdef Level < int8
    enumeration
        low (1) % quietest level
        mid (5)
            % medium level
        high (9)
    end
end
"""

SCRIPT = """\
% Demo pipeline script.
% Computes a rolling statistic over a vector.

% setup
v = linspace(0, 1, 50);

% compute
s = cumsum(v);
disp(s(end));
"""

BLOCK_COMMENT_FN = """\
function out = fold_pairs(u, v)
%{
Fold two vectors pairwise.
Covers block-comment docstrings

with an embedded blank line.
%}

%#codegen
out = u + v;
end
"""

PRAGMA_FN = """\
function z = clipped_add(a, b)
% Clipped addition helper
%
%#codegen
%#eml
% --8<-- [start:snip]
%
% Adds then clips to [0, 1].

z = min(max(a + b, 0), 1);
end
"""

NS_FN = """\
function [scaled] = rescale_span(x, opts)
% Rescale a vector into a target span.
%
% Example:
%   y = metrics.rescale_span(1:5)

    arguments
        x (1,:) double {mustBeNumeric}
            % Vector to rescale
        opts.span (1,1) double {mustBePositive} = 1
            % Width of the output interval
    end

    scaled = x / max(abs(x)) * opts.span;
end
"""

NS_CLS = """\
classdef Gauge
% Namespaced gauge class

    properties
        Value double = 0
            % Stored gauge value
    end

    methods
        function obj = Gauge(v)
            % Gauge constructor
            arguments
                v (1,1) double = 0
                    % Initial gauge value
            end
            obj.Value = v;
        end

        function obj = bump(obj, amount)
            % Bump the gauge
            arguments
                obj
                amount (1,1) double = 1
                    % Amount to add
            end
            obj.Value = obj.Value + amount;
        end
    end
end
"""

CF_MAIN = """\
classdef Ledger
% Ledger class folder main file

    properties
        Entries (1,:) double = []
        Label string = ""
    end

    methods
        function obj = Ledger(label, entries)
            % Ledger constructor
            arguments
                label string = "default"
                    % Ledger display label
                entries (1,:) double = []
                    % Seed entries
            end
            obj.Label = label;
            obj.Entries = entries;
        end
    end
end
"""

CF_METHOD = """\
function [summary] = summarize(obj, detail)
% Summarize ledger entries
% Cross-file class-folder method.

    arguments
        obj
        detail (1,1) string {mustBeMember(detail, ["short", "long"])} = "short"
            % Level of detail in the summary
    end

    summary = struct('n', numel(obj.Entries), 'total', sum(obj.Entries));
end
"""

CF_STATIC = """\
function blank_ledger()
% Static-style helper in the class folder
end
"""

CF_PRIVATE = """\
function rebalance(obj)
% Private helper of the Ledger class folder
end
"""

MALFORMED = """\
function broken = malformed_unit(q
% Unterminated signature on purpose
broken = q;
"""

LIVE_PLAIN = """\
%% Overview
% A plain-text live script with alternating sections.

%% Init
a = 1:4;
b = a * 2;

%% Report
% Summarize the outputs.
disp(sum(b));
"""

DERIVED_CLS = """\
classdef FancyTracker < Tracker
% Derived tracker adding a label

    properties
        Label string = "fancy"
    end

    methods
        function obj = FancyTracker(start_val)
            % FancyTracker constructor
            arguments
                start_val double = 0
            end
            obj@Tracker(start_val);
        end
    end
end
"""

GRANDCHILD_CLS = """\
classdef TurboTracker < FancyTracker
% Second-level derived tracker

    methods
        function obj = TurboTracker()
            % TurboTracker constructor
            obj@FancyTracker(0);
        end
    end
end
"""

CONTENTS_M = """\
% Toolbox overview
% Utilities for tracking and accumulation.
"""

TOP_PRIVATE_FN = """\
function secret = top_secret(k)
% Top-level private helper — OUTSIDE glob membership (collection.py:50-75
% skips non-prefixed dirs named 'private').
secret = k * 2;
end
"""

PLAIN_UNDER_NS_FN = """\
function u = util(x)
% Plain (non-prefixed) dir under +metrics — the reference globber never
% descends plain dirs below a +namespace (descent into +/@ resets the
% recursive flag), so this file is outside glob membership.
u = x + 1;
end
"""

DEEP_NS_FN = """\
function t = tool(x)
% Namespace under nested plain dirs: reachable only with recursive=true.
t = x * 3;
end
"""

INTERNAL_FN = """\
function g = secret_gain(x)
% Internal helper under +internal (is_internal per mixins.py:205).
g = x * 1.5;
end
"""

INNER_SHADOW_FN = """\
function [scaled] = rescale_span(x)
% Inner-namespace shadow of metrics.rescale_span — scope-chain resolution
% must pick this one from inside +metrics/+inner and the outer one from
% +metrics scope.
scaled = x / max(abs(x));
end
"""

README_MD = """\
# Subdir helpers

Shadowed lower-precedence utilities. This README becomes the folder
docstring because the folder has no Contents.m (collection.py:284-295).
"""


def _chain_cls(k: int) -> str:
    base = f" < Chain{k - 1}" if k > 1 else ""
    return (
        f"classdef Chain{k}{base}\n"
        f"% Link {k} of the depth-6 inheritance chain\n"
        "    methods\n"
        f"        function obj = Chain{k}()\n"
        f"            % Chain{k} constructor\n"
        "        end\n"
        f"        function out = rung{k}(obj)\n"
        f"            % Method defined at depth {k}\n"
        f"            out = {k};\n"
        "        end\n"
        "    end\n"
        "end\n"
    )

# (relative path, text) — the project skeleton replicated per project host
CORPUS: list[tuple[str, str]] = [
    ("accumulate.m", FN_WITH_ARGS),
    ("Tracker.m", CLS_BASIC),
    ("Shape.m", CLS_ATTRS),
    ("Meter.m", CLS_GETSET),
    ("Level.m", ENUM_CLS),
    ("demo_pipeline.m", SCRIPT),
    ("fold_pairs.m", BLOCK_COMMENT_FN),
    ("clipped_add.m", PRAGMA_FN),
    ("+metrics/rescale_span.m", NS_FN),
    ("+metrics/Gauge.m", NS_CLS),
    ("+metrics/+inner/Gauge.m", NS_CLS.replace("Gauge", "InnerGauge")),
    ("@Ledger/Ledger.m", CF_MAIN),
    ("@Ledger/summarize.m", CF_METHOD),
    ("@Ledger/blank_ledger.m", CF_STATIC),
    ("@Ledger/private/rebalance.m", CF_PRIVATE),
    ("malformed_unit.m", MALFORMED),
    ("live_report.m", LIVE_PLAIN),
    ("FancyTracker.m", DERIVED_CLS),
    ("TurboTracker.m", GRANDCHILD_CLS),
    ("Contents.m", CONTENTS_M),
    ("subdir/accumulate.m", FN_WITH_ARGS),  # shadowing pair at lower precedence
    # glob-membership / privacy / scope-chain cases (P1, P19, P24, P30)
    ("private/top_secret.m", TOP_PRIVATE_FN),  # top-level private: outside glob
    ("+metrics/helpers/util.m", PLAIN_UNDER_NS_FN),  # plain dir under +pkg: outside glob
    ("subdir/nested/+deep/tool.m", DEEP_NS_FN),  # needs recursive=true
    ("+internal/secret_gain.m", INTERNAL_FN),  # is_internal
    ("+metrics/+inner/rescale_span.m", INNER_SHADOW_FN),  # scope shadow pair
    ("subdir/README.md", README_MD),  # folder-docstring fallback
] + [(f"Chain{k}.m", _chain_cls(k)) for k in range(1, 7)]

FILLER_WORDS = (
    "alpha beta gamma delta epsilon zeta eta theta iota kappa lambda mu nu "
    "xi omicron pi rho sigma tau upsilon phi chi psi omega".split()
)
LANGS = ["en", "de", "fr", "es", "zh"]


def generate_pages_rows(
    n_projects: int = 4,
    n_filler: int = 200,
    seed: int = 42,
    skew_host_frac: float = 0.5,
    ooo_frac: float = 0.2,
    late_frac: float = 0.05,
    session_gap_s: int = 120,
) -> list[tuple]:
    """Rows (url, warc_ts, html, text, lang). Each project replicates the
    corpus under its own host with session-bursty, partially out-of-order
    timestamps; filler pages carry non-MATLAB text in a seeded lang mix."""
    rng = random.Random(seed)
    rows: list[tuple] = []
    t = EPOCH

    for p in range(n_projects):
        host = "mega-mat.example.com" if (p == 0 and skew_host_frac > 0) else f"proj{p}.example.org"
        t = t + dt.timedelta(seconds=session_gap_s * 3)  # session gap between projects
        base = t
        for k, (rel, text) in enumerate(CORPUS):
            ts = base + dt.timedelta(seconds=k * 2 + rng.uniform(0, 1))
            if rng.random() < ooo_frac:
                ts -= dt.timedelta(seconds=rng.uniform(5, 30))
            if rng.random() < late_frac:
                ts -= dt.timedelta(seconds=rng.uniform(600, 1200))
            url = f"https://{host}/matlab/toolbox/{rel}"
            html = ("<pre>" + text + "</pre>").encode("utf-8")
            # README pages carry their natural language — the extraction
            # filter must admit them by filename, not by lang
            lang = "en" if rel.endswith(".md") else "matlab"
            rows.append((url, ts, html, text, lang))
        t = base + dt.timedelta(seconds=len(CORPUS) * 2)

    # filler pages (must be filtered out cheaply before the UDF)
    mega = "mega-mat.example.com"
    for i in range(n_filler):
        host = mega if rng.random() < skew_host_frac else f"filler{rng.randrange(50)}.example.net"
        ts = EPOCH + dt.timedelta(seconds=rng.uniform(0, 3600))
        words = " ".join(rng.choice(FILLER_WORDS) for _ in range(rng.randrange(20, 80)))
        url = f"https://{host}/page/{i}"
        rows.append((url, ts, ("<p>" + words + "</p>").encode(), words, rng.choice(LANGS)))

    return rows


def generate_pages_df(spark: SparkSession, **kwargs) -> DataFrame:
    return spark.createDataFrame(generate_pages_rows(**kwargs), PAGES)


def synth_class_source(name: str, n_methods: int = 20, seed: int = 1) -> str:
    """A heavyweight classdef (representative of real-world MATLAB files):
    n methods with arguments blocks, validators, and docstrings."""
    rng = random.Random(seed)
    parts = [
        f"classdef {name} < handle",
        f"% Synthetic heavy class {name}",
        "% Exercises extraction throughput on realistically sized files.",
        "",
        "    properties",
    ]
    for i in range(max(2, n_methods // 4)):
        parts.append(f"        Field{i} (1,:) double = []")
        parts.append(f"            % Storage field number {i}")
    parts += ["    end", "", "    methods"]
    for i in range(n_methods):
        v = rng.choice(["mustBePositive", "mustBeFinite", "mustBeReal"])
        parts += [
            f"        function out = step{i}(obj, x, opts)",
            f"            % Step method {i} of {name}",
            "            % Applies a staged transformation to x.",
            "",
            "            arguments",
            "                obj",
            f"                x (1,:) double {{{v}}}",
            f"                    % Input vector for step {i}",
            f"                opts.gain (1,1) double = {i + 1}",
            "                    % Gain multiplier",
            "            end",
            "",
            f"            y = x * opts.gain + {i};",
            "            out = cumsum(y);",
            "        end",
            "",
        ]
    parts += ["    end", "end", ""]
    return "\n".join(parts)


HEAVY_TEMPLATES = [synth_class_source(f"Heavy{k}", 16 + 4 * k, seed=k) for k in range(4)]
