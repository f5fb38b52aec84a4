from .typed_csv import read_typed_csv, register_typed_csv_dir, write_typed_csv

__all__ = ["read_typed_csv", "register_typed_csv_dir", "write_typed_csv"]
