"""Test-support utilities shipped with the package (the reference ships
its golden-output harness in src/test; here it is importable product
surface so downstream pipelines can record/verify their own fixtures).
"""
