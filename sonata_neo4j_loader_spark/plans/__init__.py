"""End-to-end pipeline plans and lineage/checkpoint machinery."""
