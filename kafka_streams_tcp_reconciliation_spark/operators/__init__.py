"""Reusable operator library.

Each module implements one operator family from SURVEY.md §2 as pure
DataFrame transformations (no collect(), no driver-side loops) so the same
code runs at any scale with partition tuning only.
"""
