"""Schema registry: explicit per-table contracts for the Olist pipeline.

The reference infers bronze schemas (inferSchema + Auto Loader evolution,
db_notebooks/01_bronze_csv_to_delta.py:37-40) and encodes silver
contracts implicitly in per-table notebook code. The engine makes both
explicit: a raw (all-string CSV) schema per table, the silver CleanSpec
(types, null policy, domains — db_notebooks/02_bronze_to_silver.py per
table), and the merge keys + version column.

Timestamp format everywhere: yyyy-MM-dd HH:mm:ss (02:526).
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import types as T

from real_time_e_commerce_analytics_lakehouse_spark.operators.cleaning import (
    CleanSpec,
    ColumnRule,
)

TS_FMT = "yyyy-MM-dd HH:mm:ss"
LINEAGE_COLS = ("ingestion_ts", "source_file")


def _raw_schema(*cols: str) -> T.StructType:
    """Raw CSVs arrive all-string with a header (FIXTURES.md)."""
    return T.StructType([T.StructField(c, T.StringType(), True) for c in cols])


@dataclass
class TableContract:
    name: str
    raw_schema: T.StructType
    clean_spec: CleanSpec
    merge_keys: tuple[str, ...]
    version_col: str = "ingestion_ts"  # late-data guard column (02:74)
    incremental: bool = True  # False => full-refresh silver (reviews, 02:543-550)


def _ts_rule(src: str) -> ColumnRule:
    # null-on-failure parse; malformed timestamps survive as NULL (02:524-531)
    return ColumnRule(source=src, timestamp_format=TS_FMT)


ORDER_STATUS_DOMAIN = (
    "created", "approved", "invoiced", "processing",
    "shipped", "delivered", "canceled", "unavailable",
)  # 02:579-588

CONTRACTS: dict[str, TableContract] = {}


def _register(c: TableContract) -> None:
    CONTRACTS[c.name] = c


_register(
    TableContract(
        name="customers",
        raw_schema=_raw_schema(
            "customer_id", "customer_unique_id", "customer_zip_code_prefix",
            "customer_city", "customer_state",
        ),
        clean_spec=CleanSpec(
            columns={
                "customer_id": ColumnRule(transforms=("trim",)),
                "customer_unique_id": ColumnRule(transforms=("trim",)),
                "customer_zip_code_prefix": ColumnRule(transforms=("trim",)),
                "customer_city": ColumnRule(transforms=("trim", "upper")),  # 02:48
                "customer_state": ColumnRule(transforms=("trim", "upper")),  # 02:49
            },
            require_keys=("customer_id", "customer_unique_id"),  # 02:46-47
            keep_extra=LINEAGE_COLS,
        ),
        merge_keys=("customer_id",),
    )
)

_register(
    TableContract(
        name="geolocation",
        raw_schema=_raw_schema(
            "geolocation_zip_code_prefix", "geolocation_lat", "geolocation_lng",
            "geolocation_city", "geolocation_state",
        ),
        clean_spec=CleanSpec(
            columns={
                # renames per 02:138-146
                "zip_code_prefix": ColumnRule(
                    source="geolocation_zip_code_prefix", transforms=("trim",)
                ),
                "latitude": ColumnRule(source="geolocation_lat", try_cast="double"),
                "longitude": ColumnRule(source="geolocation_lng", try_cast="double"),
                "city": ColumnRule(
                    source="geolocation_city", transforms=("trim", "lower")
                ),
                "state": ColumnRule(
                    source="geolocation_state", transforms=("trim", "upper")
                ),
            },
            require_keys=("zip_code_prefix", "latitude", "longitude"),  # 02:147-152
            keep_extra=LINEAGE_COLS,
        ),
        merge_keys=("zip_code_prefix",),  # consolidated per-zip (02:181-184)
    )
)

_register(
    TableContract(
        name="order_items",
        raw_schema=_raw_schema(
            "order_id", "order_item_id", "product_id", "seller_id",
            "shipping_limit_date", "price", "freight_value",
        ),
        clean_spec=CleanSpec(
            columns={
                "order_id": ColumnRule(transforms=("trim",)),
                "order_item_id": ColumnRule(cast="int"),  # 02:274
                "product_id": ColumnRule(transforms=("trim",)),
                "seller_id": ColumnRule(transforms=("trim",)),
                "shipping_limit_date": _ts_rule("shipping_limit_date"),  # 02:277
                "price": ColumnRule(cast="double"),  # 02:278
                "freight_value": ColumnRule(cast="double"),  # 02:279
            },
            require_keys=("order_id", "order_item_id"),  # 02:283-286
            keep_extra=LINEAGE_COLS,
        ),
        merge_keys=("order_id", "order_item_id"),  # composite (02:335-343)
    )
)

_register(
    TableContract(
        name="order_payments",
        raw_schema=_raw_schema(
            "order_id", "payment_sequential", "payment_type",
            "payment_installments", "payment_value",
        ),
        clean_spec=CleanSpec(
            columns={
                "order_id": ColumnRule(transforms=("trim",)),
                "payment_sequential": ColumnRule(try_cast="int"),  # 02:417-420
                "payment_type": ColumnRule(transforms=("trim", "lower")),  # 02:428-431
                # NULL installments default to 1 (02:434-438)
                "payment_installments": ColumnRule(try_cast="int", default=1),
                "payment_value": ColumnRule(try_cast="decimal(10,2)"),  # 02:411-414
            },
            require_keys=("order_id", "payment_sequential", "payment_value"),  # 02:407-415
            keep_extra=LINEAGE_COLS,
        ),
        merge_keys=("order_id", "payment_sequential"),  # 02:463-471
    )
)

_register(
    TableContract(
        name="order_reviews",
        raw_schema=_raw_schema(
            "review_id", "order_id", "review_score", "review_comment_title",
            "review_comment_message", "review_creation_date", "review_answer_timestamp",
        ),
        clean_spec=CleanSpec(
            columns={
                "review_id": ColumnRule(transforms=("trim",)),
                "order_id": ColumnRule(transforms=("trim",)),
                "review_score": ColumnRule(try_cast="int"),  # 02:513-516
                "review_comment_title": ColumnRule(transforms=("trim",)),  # 02:520
                "review_comment_message": ColumnRule(transforms=("trim",)),  # 02:521
                "review_creation_date": _ts_rule("review_creation_date"),  # 02:524-527
                "review_answer_timestamp": _ts_rule("review_answer_timestamp"),  # 02:528-531
            },
            require_keys=("review_id", "order_id", "review_creation_date"),  # 02:509-510,534
            ranges={"review_score": (1, 5)},  # 02:517
            keep_extra=LINEAGE_COLS,
        ),
        merge_keys=("review_id",),
        incremental=False,  # reference full-refreshes reviews silver (02:543-550)
    )
)

_register(
    TableContract(
        name="orders",
        raw_schema=_raw_schema(
            "order_id", "customer_id", "order_status", "order_purchase_timestamp",
            "order_approved_at", "order_delivered_carrier_date",
            "order_delivered_customer_date", "order_estimated_delivery_date",
        ),
        clean_spec=CleanSpec(
            columns={
                "order_id": ColumnRule(transforms=("trim",)),
                "customer_id": ColumnRule(transforms=("trim",)),
                "order_status": ColumnRule(transforms=("trim", "lower")),
                "order_purchase_timestamp": _ts_rule("order_purchase_timestamp"),
                "order_approved_at": _ts_rule("order_approved_at"),
                "order_delivered_carrier_date": _ts_rule("order_delivered_carrier_date"),
                "order_delivered_customer_date": _ts_rule("order_delivered_customer_date"),
                "order_estimated_delivery_date": _ts_rule("order_estimated_delivery_date"),
            },
            require_keys=("order_id", "customer_id"),  # 02:596-598
            domains={"order_status": ORDER_STATUS_DOMAIN},  # 02:601
            keep_extra=LINEAGE_COLS,
        ),
        merge_keys=("order_id",),
    )
)

_register(
    TableContract(
        name="products",
        raw_schema=_raw_schema(
            "product_id", "product_category_name", "product_name_lenght",
            "product_description_lenght", "product_photos_qty", "product_weight_g",
            "product_length_cm", "product_height_cm", "product_width_cm",
        ),
        clean_spec=CleanSpec(
            columns={
                "product_id": ColumnRule(transforms=("trim",)),
                "product_category_name": ColumnRule(transforms=("trim", "lower")),  # 02:707-710
                "product_name_lenght": ColumnRule(try_cast="int"),  # 02:713
                "product_description_lenght": ColumnRule(try_cast="int"),
                "product_photos_qty": ColumnRule(try_cast="int"),
                "product_weight_g": ColumnRule(try_cast="int"),  # 02:717-720
                "product_length_cm": ColumnRule(try_cast="int"),
                "product_height_cm": ColumnRule(try_cast="int"),
                "product_width_cm": ColumnRule(try_cast="int"),
            },
            require_keys=("product_id",),  # 02:704
            keep_extra=LINEAGE_COLS,
        ),
        merge_keys=("product_id",),
    )
)

_register(
    TableContract(
        name="sellers",
        raw_schema=_raw_schema(
            "seller_id", "seller_zip_code_prefix", "seller_city", "seller_state",
        ),
        clean_spec=CleanSpec(
            columns={
                "seller_id": ColumnRule(transforms=("trim",)),
                "seller_zip_code_prefix": ColumnRule(try_cast="int"),  # 02:809-812
                "seller_city": ColumnRule(transforms=("trim", "initcap")),  # 02:815
                "seller_state": ColumnRule(transforms=("trim", "upper")),  # 02:816
            },
            require_keys=("seller_id",),  # 02:806
            keep_extra=LINEAGE_COLS,
        ),
        merge_keys=("seller_id",),
    )
)
