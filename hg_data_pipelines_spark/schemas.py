"""Explicit schemas for every table the engine touches.

The reference infers everything dynamically from pandas/JSON (no declared
schema anywhere — see SURVEY.md §1.3); this engine inverts that: schemas are
declared here and enforced at read time, so schema drift is an error at the
source instead of a silent downstream corruption.

Two groups:
- TESTDATA relational tables (driver-generated parquet; FIXTURES.md §1)
- heritage-domain tables (detection results JSON, camera pose CSV, class dim)
  whose shapes derive from the reference's readers
  (reference: heritage-guard/heritage_guard/assets/detected_objects_processing/
  detected_objects_processing.py:19-21, street_level_grouping.py:88-90,141).
"""

from __future__ import annotations

from pyspark.sql import types as T

# --------------------------------------------------------------------------
# TESTDATA tables (FIXTURES.md §1). Parquet carries its own physical schema;
# these are the *logical* contracts reads are validated against.
# --------------------------------------------------------------------------

REGION = T.StructType(
    [
        T.StructField("r_regionkey", T.IntegerType()),
        T.StructField("r_name", T.StringType()),
    ]
)

NATION = T.StructType(
    [
        T.StructField("n_nationkey", T.IntegerType()),
        T.StructField("n_name", T.StringType()),
        T.StructField("n_regionkey", T.IntegerType()),
    ]
)

CUSTOMER = T.StructType(
    [
        T.StructField("c_custkey", T.LongType()),
        T.StructField("c_name", T.StringType()),
        T.StructField("c_nationkey", T.IntegerType()),
        T.StructField("c_acctbal", T.DoubleType()),
        T.StructField("c_mktsegment", T.StringType()),
    ]
)

SUPPLIER = T.StructType(
    [
        T.StructField("s_suppkey", T.LongType()),
        T.StructField("s_name", T.StringType()),
        T.StructField("s_nationkey", T.IntegerType()),
        T.StructField("s_acctbal", T.DoubleType()),
    ]
)

PART = T.StructType(
    [
        T.StructField("p_partkey", T.LongType()),
        T.StructField("p_name", T.StringType()),
        T.StructField("p_brand", T.StringType()),
        T.StructField("p_type", T.StringType()),
        T.StructField("p_size", T.IntegerType()),
        T.StructField("p_retailprice", T.DoubleType()),
    ]
)

ORDERS = T.StructType(
    [
        T.StructField("o_orderkey", T.LongType()),
        T.StructField("o_custkey", T.LongType()),
        T.StructField("o_orderstatus", T.StringType()),
        T.StructField("o_totalprice", T.DoubleType()),
        T.StructField("o_orderdate", T.TimestampNTZType()),
        T.StructField("o_orderpriority", T.StringType()),
    ]
)

LINEITEM = T.StructType(
    [
        T.StructField("l_orderkey", T.LongType()),
        T.StructField("l_partkey", T.LongType()),
        T.StructField("l_suppkey", T.LongType()),
        T.StructField("l_linenumber", T.IntegerType()),
        T.StructField("l_quantity", T.DoubleType()),
        T.StructField("l_extendedprice", T.DoubleType()),
        T.StructField("l_discount", T.DoubleType()),
        T.StructField("l_tax", T.DoubleType()),
        T.StructField("l_returnflag", T.StringType()),
        T.StructField("l_linestatus", T.StringType()),
        T.StructField("l_shipdate", T.TimestampNTZType()),
    ]
)

EVENTS = T.StructType(
    [
        T.StructField("event_id", T.LongType()),
        T.StructField("ts", T.TimestampNTZType()),
        T.StructField("user_id", T.LongType()),
        T.StructField("event_type", T.StringType()),
        T.StructField("value", T.DoubleType()),
        T.StructField("props", T.StringType()),  # JSON string
    ]
)

DOCUMENTS = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("text", T.StringType()),
        T.StructField("lang", T.StringType()),
        T.StructField("source", T.StringType()),
        T.StructField("n_chars", T.LongType()),
    ]
)

EMBEDDINGS = T.StructType(
    [
        T.StructField("vec_id", T.LongType()),
        T.StructField("embedding", T.ArrayType(T.FloatType())),
        T.StructField("label", T.IntegerType()),
    ]
)

TESTDATA_TABLES: dict[str, T.StructType] = {
    "region": REGION,
    "nation": NATION,
    "customer": CUSTOMER,
    "supplier": SUPPLIER,
    "part": PART,
    "orders": ORDERS,
    "lineitem": LINEITEM,
    "events": EVENTS,
    "documents": DOCUMENTS,
    "embeddings": EMBEDDINGS,
}

# --------------------------------------------------------------------------
# Heritage-domain schemas (SURVEY.md §1.1/§1.2).
# --------------------------------------------------------------------------

# GeoJSON-ish polygon mapping produced by shapely.geometry.mapping
# (reference: street_level_grouping.py:71).
GEOJSON_POLYGON = T.StructType(
    [
        T.StructField("type", T.StringType()),
        T.StructField(
            "coordinates",
            T.ArrayType(T.ArrayType(T.ArrayType(T.DoubleType()))),
        ),
    ]
)

# One detected object inside a panorama photo
# (reference nested-JSON shape: street_level_grouping.py:67-78; FIXTURES.md §2.1).
DETECTED_OBJECT = T.StructType(
    [
        T.StructField("bbox", T.ArrayType(T.DoubleType())),  # [x1,y1,x2,y2]
        T.StructField("polygon", GEOJSON_POLYGON),
        T.StructField("score", T.DoubleType()),
        T.StructField("class", T.IntegerType()),
    ]
)

# results.json: array-of-structs per photo; the N1 explode input
# (reference: pd.json_normalize(data, 'objects', 'file_name') —
# detected_objects_processing.py:21).
RESULTS_JSON = T.StructType(
    [
        T.StructField("file_name", T.StringType()),
        T.StructField("objects", T.ArrayType(DETECTED_OBJECT)),
    ]
)

# Camera pose reference table (tab-separated CSV;
# reference: street_level_grouping.py:141,184-189; FIXTURES.md §2.3).
POSE_REFERENCE = T.StructType(
    [
        T.StructField("file_name", T.StringType()),
        T.StructField("roll[deg]", T.DoubleType()),
        T.StructField("pitch[deg]", T.DoubleType()),
        T.StructField("heading[deg]", T.DoubleType()),
        T.StructField("projectedX[m]", T.DoubleType()),
        T.StructField("projectedY[m]", T.DoubleType()),
        T.StructField("projectedZ[m]", T.DoubleType()),
    ]
)

# Per-crop detector output: parallel arrays (positional zip J3;
# reference: street_level_grouping.py:52-66; FIXTURES.md §2.2).
PREDICTIONS_JSON = T.StructType(
    [
        T.StructField("bboxes", T.ArrayType(T.ArrayType(T.DoubleType()))),
        T.StructField("labels", T.ArrayType(T.IntegerType())),
        T.StructField("scores", T.ArrayType(T.DoubleType())),
        T.StructField(
            "masks",
            T.ArrayType(
                T.StructType(
                    [
                        T.StructField("size", T.ArrayType(T.IntegerType())),
                        T.StructField("counts", T.StringType()),
                    ]
                )
            ),
        ),
    ]
)

# Object-class dimension (reference: CONSTANTS.py:4-13 dict; ids 5/6 absent).
CLASS_DIM = T.StructType(
    [
        T.StructField("class", T.IntegerType()),
        T.StructField("class_name", T.StringType()),
    ]
)

# Rows of CLASS_DIM — the reference's CLASS_ID_TO_CLASS_NAME mapping.
CLASS_DIM_ROWS: list[tuple[int, str]] = [
    (1, "Window"),
    (2, "Fronton"),
    (3, "Door"),
    (4, "Pilaster"),
    (7, "Balcony"),
    (8, "Gate"),
    (9, "Pediment"),
    (10, "Pillar"),
]
