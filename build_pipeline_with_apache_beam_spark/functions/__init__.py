"""Function registration helpers (UDF surface)."""
