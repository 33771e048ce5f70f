from nifi_daffodil_spark.fixtures.walgen import WalSpec, generate_wal

__all__ = ["WalSpec", "generate_wal"]
