"""Composite DataFrame operators (the engine's physical library).

Each module composes built-in DataFrame primitives into one named
capability from the reference inventory (SURVEY.md §2) or the
north-star LLM-data set. All operators are lazy DataFrame->DataFrame
transforms — no collect(), no driver-side loops — so the same code
runs on local[32] and a 1000-executor cluster.
"""
