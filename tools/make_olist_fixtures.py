"""Deterministic Olist-shaped fixture CSVs with dirty rows.

Generates the 8 raw tables into a landing directory (one subdir per
table, one or more CSV files each) exactly per FIXTURES.md: NULL keys,
malformed timestamps, out-of-domain statuses/scores, non-numeric
numerics, mixed case + stray whitespace, duplicate business keys across
files (for dedup-latest and replay tests), and referential orphans (for
left-join null paths).

Usage: make_fixtures(landing_dir, seed=42) or CLI:
    python tools/make_olist_fixtures.py /tmp/landing
"""

from __future__ import annotations

import csv
import os
import random
import sys

BR_STATES = ["SP", "RJ", "MG", "BA", "RS", "PR", "SC", "PE", "CE", "GO"]
CITIES = ["sao paulo", "rio de janeiro", "campinas", "guarulhos", "santos"]
CATEGORIES = ["beleza_saude", "esporte_lazer", "moveis_decoracao", "informatica", None]
STATUSES = [
    "delivered", "delivered", "delivered", "shipped", "canceled",
    "invoiced", "processing", "created", "approved", "unavailable",
]
PAYMENT_TYPES = ["Credit_Card", "BOLETO", "voucher", "debit_card"]


def _w(path: str, header: list[str], rows: list[list]) -> None:
    os.makedirs(os.path.dirname(path), exist_ok=True)
    with open(path, "w", newline="") as f:
        w = csv.writer(f)
        w.writerow(header)
        w.writerows(rows)


def make_fixtures(
    landing: str,
    seed: int = 42,
    n_customers: int = 100,
    n_products: int = 50,
    n_sellers: int = 20,
    n_orders: int = 300,
    file_suffix: str = "part1",
) -> dict[str, int]:
    rng = random.Random(seed)
    counts: dict[str, int] = {}

    def ts(y0=2017, y1=2018) -> str:
        return (
            f"{rng.randint(y0, y1)}-{rng.randint(1, 12):02d}-{rng.randint(1, 28):02d} "
            f"{rng.randint(0, 23):02d}:{rng.randint(0, 59):02d}:{rng.randint(0, 59):02d}"
        )

    # customers — dup ids across rows, one NULL id, one NULL unique id
    cust_rows = []
    for i in range(n_customers):
        cust_rows.append(
            [
                f"cust_{i:04d}",
                f"uniq_{i % (n_customers * 3 // 4):04d}",  # many-to-one
                f"{rng.randint(1000, 99999):05d}",
                "  " + rng.choice(CITIES).title(),
                rng.choice(BR_STATES).lower(),
            ]
        )
    cust_rows.append(["", "uniq_null", "11111", "city", "SP"])  # NULL id -> rejected
    cust_rows.append(["cust_nullu", "", "22222", "city", "RJ"])  # NULL unique -> rejected
    cust_rows.append(["cust_0001", "uniq_0001", "33333", "updated city", "mg"])  # dup id
    counts["customers"] = len(cust_rows)
    _w(
        os.path.join(landing, "customers", f"customers_{file_suffix}.csv"),
        ["customer_id", "customer_unique_id", "customer_zip_code_prefix",
         "customer_city", "customer_state"],
        cust_rows,
    )

    # geolocation — several rows per zip, variant city spellings, NULLs
    geo_rows = []
    for z in range(30):
        zp = f"{10000 + z}"
        n_pts = rng.randint(2, 5)
        for _ in range(n_pts):
            city = rng.choice([CITIES[z % len(CITIES)], CITIES[z % len(CITIES)],
                               CITIES[(z + 1) % len(CITIES)]])
            geo_rows.append(
                [zp, f"{-23 + rng.random():.6f}", f"{-46 + rng.random():.6f}",
                 city.upper() if rng.random() < 0.3 else city, rng.choice(BR_STATES)]
            )
    geo_rows.append(["", "1.0", "2.0", "x", "SP"])  # NULL zip -> rejected
    geo_rows.append(["99999", "", "2.0", "x", "SP"])  # NULL lat -> rejected
    counts["geolocation"] = len(geo_rows)
    _w(
        os.path.join(landing, "geolocation", f"geolocation_{file_suffix}.csv"),
        ["geolocation_zip_code_prefix", "geolocation_lat", "geolocation_lng",
         "geolocation_city", "geolocation_state"],
        geo_rows,
    )

    # orders — domain violations, malformed timestamps, orphan customer
    order_rows = []
    order_ids = []
    for i in range(n_orders):
        oid = f"order_{i:05d}"
        order_ids.append(oid)
        purchase = ts()
        status = rng.choice(STATUSES)
        delivered = ts() if status == "delivered" else ""
        order_rows.append(
            [oid, f"cust_{rng.randrange(n_customers):04d}", status, purchase,
             ts() if rng.random() > 0.1 else "", ts() if delivered else "",
             delivered, ts()]
        )
    order_rows.append(["order_badst", "cust_0000", "returned", ts(), "", "", "", ts()])  # bad domain
    order_rows.append(["order_badts", "cust_0000", "delivered", "2016-13-40 99:99:99", "", "", ts(), ts()])  # bad ts survives as NULL purchase
    order_rows.append(["", "cust_0000", "delivered", ts(), "", "", "", ts()])  # NULL id
    order_rows.append(["order_orphan", "cust_9999", "delivered", ts(), "", "", ts(), ts()])  # orphan customer fk
    counts["orders"] = len(order_rows)
    _w(
        os.path.join(landing, "orders", f"orders_{file_suffix}.csv"),
        ["order_id", "customer_id", "order_status", "order_purchase_timestamp",
         "order_approved_at", "order_delivered_carrier_date",
         "order_delivered_customer_date", "order_estimated_delivery_date"],
        order_rows,
    )

    # order_items — 1..3 per order, composite key, NULL order_id row
    item_rows = []
    for oid in order_ids:
        for item_no in range(1, rng.randint(2, 4)):
            item_rows.append(
                [oid, str(item_no), f"prod_{rng.randrange(n_products):03d}",
                 f"sell_{rng.randrange(n_sellers):02d}", ts(),
                 f"{rng.uniform(10, 500):.2f}", f"{rng.uniform(5, 60):.2f}"]
            )
    item_rows.append(["", "1", "prod_000", "sell_00", ts(), "10.0", "1.0"])  # NULL key
    counts["order_items"] = len(item_rows)
    _w(
        os.path.join(landing, "order_items", f"order_items_{file_suffix}.csv"),
        ["order_id", "order_item_id", "product_id", "seller_id",
         "shipping_limit_date", "price", "freight_value"],
        item_rows,
    )

    # order_payments — unique (order, seq); dirty numerics
    pay_rows = []
    for oid in order_ids:
        for seq in range(1, rng.randint(2, 3)):
            pay_rows.append(
                [oid, str(seq), rng.choice(PAYMENT_TYPES),
                 str(rng.randint(1, 10)) if rng.random() > 0.05 else "",  # NULL -> default 1
                 f"{rng.uniform(20, 600):.2f}"]
            )
    pay_rows.append(["order_00000", "9", "voucher", "abc", "12.50"])  # non-numeric installments -> NULL -> 1
    pay_rows.append(["order_00001", "9", "voucher", "1", "not_a_number"])  # bad value -> rejected
    counts["order_payments"] = len(pay_rows)
    _w(
        os.path.join(landing, "order_payments", f"order_payments_{file_suffix}.csv"),
        ["order_id", "payment_sequential", "payment_type",
         "payment_installments", "payment_value"],
        pay_rows,
    )

    # order_reviews — scores incl. out-of-domain, malformed creation dates
    rev_rows = []
    for i, oid in enumerate(order_ids[: n_orders // 2]):
        rev_rows.append(
            [f"rev_{i:05d}", oid, str(rng.randint(1, 5)), "  Título  ",
             "  mensagem de teste  ", ts(), ts() if rng.random() > 0.2 else "x"]
        )
    rev_rows.append(["rev_bad0", "order_00000", "0", "", "", ts(), ""])  # score 0 -> rejected
    rev_rows.append(["rev_bad6", "order_00000", "6", "", "", ts(), ""])  # score 6 -> rejected
    rev_rows.append(["rev_badabc", "order_00000", "abc", "", "", ts(), ""])  # non-numeric
    rev_rows.append(["rev_badts", "order_00000", "4", "", "", "2016-13-40 99:99:99", ""])  # bad creation -> rejected
    rev_rows.append(["rev_orphan", "order_zzzzz", "3", "", "", ts(), ""])  # orphan order fk
    counts["order_reviews"] = len(rev_rows)
    _w(
        os.path.join(landing, "order_reviews", f"order_reviews_{file_suffix}.csv"),
        ["review_id", "order_id", "review_score", "review_comment_title",
         "review_comment_message", "review_creation_date", "review_answer_timestamp"],
        rev_rows,
    )

    # products — NULL categories ~10%, int dims, 1 NULL dim row
    prod_rows = []
    for i in range(n_products):
        cat = rng.choice(CATEGORIES)
        dims = [str(rng.randint(10, 100)) for _ in range(3)]
        prod_rows.append(
            [f"prod_{i:03d}", cat or "", str(rng.randint(20, 60)) if cat else "",
             str(rng.randint(100, 3000)) if cat else "", str(rng.randint(1, 5)) if cat else "",
             str(rng.randint(50, 30000)), *dims]
        )
    prod_rows.append(["prod_nodim", "informatica", "30", "500", "1", "1000", "", "", ""])  # NULL dims -> NULL volume
    prod_rows.append(["", "beleza_saude", "1", "1", "1", "1", "1", "1", "1"])  # NULL id
    counts["products"] = len(prod_rows)
    _w(
        os.path.join(landing, "products", f"products_{file_suffix}.csv"),
        ["product_id", "product_category_name", "product_name_lenght",
         "product_description_lenght", "product_photos_qty", "product_weight_g",
         "product_length_cm", "product_height_cm", "product_width_cm"],
        prod_rows,
    )

    # sellers — quoted digit prefixes handled by csv module, mixed case city
    sell_rows = []
    for i in range(n_sellers):
        sell_rows.append(
            [f"sell_{i:02d}", f"{rng.randint(1000, 99999):05d}",
             rng.choice(CITIES), rng.choice(BR_STATES).lower()]
        )
    sell_rows.append(["", "11111", "x", "SP"])  # NULL id
    counts["sellers"] = len(sell_rows)
    _w(
        os.path.join(landing, "sellers", f"sellers_{file_suffix}.csv"),
        ["seller_id", "seller_zip_code_prefix", "seller_city", "seller_state"],
        sell_rows,
    )

    return counts


if __name__ == "__main__":
    out = sys.argv[1] if len(sys.argv) > 1 else "/tmp/olist_landing"
    print(make_fixtures(out))
    print(f"fixtures written to {out}")
