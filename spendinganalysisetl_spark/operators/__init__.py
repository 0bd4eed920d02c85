"""Operator inventory (SURVEY.md §2) — each module groups one family.

Every user-visible operator here is a *declarative plan builder*: it
takes DataFrames in and returns a lazy DataFrame out, so Catalyst can
push filters into scans, prune columns, and pick join strategies. None
of them collect() or loop driver-side (SURVEY.md §4: the reference's
eager dict loops become plans).
"""
