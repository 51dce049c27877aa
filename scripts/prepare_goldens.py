#!/usr/bin/env python3
"""Convert the reference's committed golden artifacts (fastparquet,
timestamp[ns]) into Spark-readable microsecond-timestamp parquet test
fixtures. Run once; outputs are committed under src/test/resources/golden/.

Source (read-only): /root/reference/data/{bronze,silver,gold}
"""
import pyarrow as pa
import pyarrow.parquet as pq
import shutil, os

SRC = "/root/reference/data"
DST = "src/test/resources/golden"
os.makedirs(DST, exist_ok=True)

for layer, name in [
    ("silver", "traffic_clean"), ("silver", "weather_clean"),
    ("silver", "merged_data"), ("gold", "factor_loadings"),
    ("gold", "monte_carlo_results"), ("gold", "monte_carlo_scenarios"),
]:
    t = pq.read_table(f"{SRC}/{layer}/{name}.parquet")
    fields = []
    for f in t.schema:
        if pa.types.is_timestamp(f.type):
            fields.append(pa.field(f.name, pa.timestamp("us")))
        else:
            fields.append(f)
    t = t.cast(pa.schema(fields))
    pq.write_table(t, f"{DST}/{name}.parquet")
    print(name, t.num_rows, "rows")

for csv in ["traffic_raw.csv", "weather_raw.csv"]:
    shutil.copy(f"{SRC}/bronze/{csv}", f"{DST}/{csv}")
    print("copied", csv)
