"""Seed-extend protein alignment engine (pcluster/RAPSearch2 capability)."""
