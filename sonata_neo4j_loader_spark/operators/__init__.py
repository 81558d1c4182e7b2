"""Pipeline operators: each stage is a pure DataFrame -> DataFrame transform."""
