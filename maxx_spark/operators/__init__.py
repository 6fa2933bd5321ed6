"""Relational / windowing / dedup / text / similarity operators.

Every operator is expressed declaratively on DataFrames (Catalyst plans all
physical strategy); Python UDFs appear only where semantics genuinely require
them (none in this subpackage — all ops here are pure built-in-function
compositions, JVM-side, whole-stage-codegen eligible).
"""
