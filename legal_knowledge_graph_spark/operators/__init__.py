"""Pipeline operators: each stage is a pure function DataFrame -> DataFrame."""
