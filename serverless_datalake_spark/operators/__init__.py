"""Composed operators the PySpark API lacks as single built-ins.

Each is expressed as a composition of DataFrame operations (so Catalyst
still optimizes the whole plan) — Pandas UDFs only where vectorized
Python is genuinely needed (similarity, minhash).
"""
