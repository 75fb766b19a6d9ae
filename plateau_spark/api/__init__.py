"""Reference-layout import compatibility (plateau.api.*).

The reference's public surface is ``from plateau.api.dataset import
...`` (/root/reference/plateau/api/dataset.py, a star re-export of the
eager/iter io modules). Porting users swap the package root and keep
their import paths: ``from plateau_spark.api.dataset import read_table``.
"""
