"""BloomMapFile analog: sorted parquet with parquet bloom filters.

Reference: io/BloomMapFile.java (259 LoC) — a MapFile whose writer
maintains a DynamicBloomFilter over the keys so `get` of an ABSENT key
returns without touching the data (fast negative). The columnar twin:
parquet's per-row-group bloom filters (`parquet.bloom.filter.enabled`),
which readers (Spark, DuckDB, parquet-mr) consult after min/max stats
to skip row groups a point predicate cannot match.

`write_bloom_table` is the BloomMapFile.Writer analog: range-partition
+ sort by the key (min/max prune), bloom filter on the key (hash
prune). `bloom_might_contain` is the membership probe — it reads the
serialized filter through parquet-mr and evaluates the probe
Python-side, which doubles as the footer check that the filter really
was written.

The probe hash is the parquet spec's: xxHash64, seed 0, over the
plain-encoded value (8-byte little-endian for INT64, raw bytes for
BYTE_ARRAY). Implemented here in pure Python because py4j cannot
dispatch parquet-mr's overloaded `hash(long)` for small values
(a Python int below 2^31 crosses as a Java int and picks the wrong
overload, silently hashing different bytes).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

_MASK = (1 << 64) - 1
_P1 = 11400714785074694791
_P2 = 14029467366897019727
_P3 = 1609587929392839161
_P4 = 9650029242287828579
_P5 = 2870177450012600261


def _rotl(x: int, r: int) -> int:
    return ((x << r) | (x >> (64 - r))) & _MASK


def xxh64(data: bytes, seed: int = 0) -> int:
    """xxHash64 (public algorithm; the parquet bloom-filter hash)."""
    n, i = len(data), 0
    if n >= 32:
        v1 = (seed + _P1 + _P2) & _MASK
        v2 = (seed + _P2) & _MASK
        v3 = seed & _MASK
        v4 = (seed - _P1) & _MASK
        while i <= n - 32:
            for j in range(4):
                k = int.from_bytes(data[i + 8 * j : i + 8 * j + 8], "little")
                if j == 0:
                    v1 = (_rotl((v1 + k * _P2) & _MASK, 31) * _P1) & _MASK
                elif j == 1:
                    v2 = (_rotl((v2 + k * _P2) & _MASK, 31) * _P1) & _MASK
                elif j == 2:
                    v3 = (_rotl((v3 + k * _P2) & _MASK, 31) * _P1) & _MASK
                else:
                    v4 = (_rotl((v4 + k * _P2) & _MASK, 31) * _P1) & _MASK
            i += 32
        h = (_rotl(v1, 1) + _rotl(v2, 7) + _rotl(v3, 12) + _rotl(v4, 18)) & _MASK
        for v in (v1, v2, v3, v4):
            h = (
                (h ^ ((_rotl((v * _P2) & _MASK, 31) * _P1) & _MASK)) * _P1 + _P4
            ) & _MASK
    else:
        h = (seed + _P5) & _MASK
    h = (h + n) & _MASK
    while i <= n - 8:
        k = int.from_bytes(data[i : i + 8], "little")
        h = (
            _rotl(h ^ ((_rotl((k * _P2) & _MASK, 31) * _P1) & _MASK), 27) * _P1 + _P4
        ) & _MASK
        i += 8
    if i <= n - 4:
        k = int.from_bytes(data[i : i + 4], "little")
        h = (_rotl(h ^ ((k * _P1) & _MASK), 23) * _P2 + _P3) & _MASK
        i += 4
    while i < n:
        h = (_rotl(h ^ ((data[i] * _P5) & _MASK), 11) * _P1) & _MASK
        i += 1
    h ^= h >> 33
    h = (h * _P2) & _MASK
    h ^= h >> 29
    h = (h * _P3) & _MASK
    h ^= h >> 32
    return h


def _bloom_hash(value, type_name: str = "INT64") -> int:
    """Parquet bloom hash of a plain-encoded value, as a SIGNED 64-bit
    int (what parquet-mr's findHash(long) expects through py4j)."""
    if isinstance(value, bool):
        raise TypeError("parquet writes no bloom filters for booleans")
    if isinstance(value, int):
        width = 4 if type_name == "INT32" else 8  # plain little-endian
        data = value.to_bytes(width, "little", signed=True)
    elif isinstance(value, str):
        data = value.encode("utf-8")  # BYTE_ARRAY plain
    elif isinstance(value, (bytes, bytearray)):
        data = bytes(value)
    else:
        raise TypeError(f"unsupported bloom probe type {type(value).__name__}")
    h = xxh64(data)
    return h - (1 << 64) if h >= (1 << 63) else h


def write_bloom_table(
    df: DataFrame,
    path: str,
    key_col: str,
    num_partitions: int = 1,
    expected_ndv: int | None = None,
    mode: str = "overwrite",
) -> None:
    """BloomMapFile.Writer analog: parquet sorted by `key_col` (row-group
    min/max = MapFile's sparse index) with a bloom filter on the key
    (fast negative for point lookups that fall inside a min/max range)."""
    w = (
        df.repartitionByRange(num_partitions, F.col(key_col))
        .sortWithinPartitions(key_col)
        .write.mode(mode)
        .option(f"parquet.bloom.filter.enabled#{key_col}", "true")
    )
    if expected_ndv is not None:
        w = w.option(f"parquet.bloom.filter.expected.ndv#{key_col}", str(expected_ndv))
    w.parquet(path)


def _footer_reader(spark: SparkSession, parquet_file: str):
    jvm = spark.sparkContext._jvm
    conf = spark.sparkContext._jsc.hadoopConfiguration()
    infile = jvm.org.apache.parquet.hadoop.util.HadoopInputFile.fromPath(
        jvm.org.apache.hadoop.fs.Path(parquet_file), conf
    )
    return jvm.org.apache.parquet.hadoop.ParquetFileReader.open(infile)


def bloom_offsets(spark: SparkSession, parquet_file: str) -> dict[str, list[int]]:
    """Per-column bloom-filter offsets across row groups (-1 = none) —
    the footer evidence that the writer option took effect."""
    reader = _footer_reader(spark, parquet_file)
    try:
        out: dict[str, list[int]] = {}
        for block in reader.getFooter().getBlocks():
            for col in block.getColumns():
                out.setdefault(col.getPath().toDotString(), []).append(
                    col.getBloomFilterOffset()
                )
        return out
    finally:
        reader.close()


def bloom_might_contain(
    spark: SparkSession, parquet_file: str, col_name: str, value
) -> bool:
    """BloomMapFile.Reader.probablyHasKey analog: False means NO row
    group in the file can contain `value` — the lookup skips the whole
    file without scanning data pages."""
    reader = _footer_reader(spark, parquet_file)
    try:
        for block in reader.getFooter().getBlocks():
            for col in block.getColumns():
                if col.getPath().toDotString() != col_name:
                    continue
                tname = col.getPrimitiveType().getPrimitiveTypeName().toString()
                bf = reader.readBloomFilter(col)
                if bf is None or bf.findHash(_bloom_hash(value, tname)):
                    return True  # no filter → can't rule out
        return False
    finally:
        reader.close()
