#!/usr/bin/env python3
"""Environment-gate probe (VERDICT r6 item 4: re-probe every round, RECORD it).

Checks every capability the engine gates on:
  - optional Python packages (protobuf -> transformWithStateInPandas; PIL/av ->
    real multimodal decode; delta/pyiceberg -> lakehouse table formats;
    confluent_kafka -> wire-client parity tests; fastavro/avro -> Avro oracle)
  - Spark connector jars under pyspark/jars (kafka datasource, spark-avro)
  - the spark-avro SQL functions actually loading (jar presence != loaded)
  - outbound network (maven fetch of missing connectors)

Writes ENVPROBE_r{N}.json at the repo root (pass the round via --round, default
"manual"). Exit code 0 always — this records state, it does not gate.
"""
import argparse
import glob
import importlib
import json
import os
import socket
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

PKGS = {
    "google.protobuf": "transformWithStateInPandas (T7 full surface)",
    "PIL": "real image decode (L5)",
    "av": "real audio/video decode (L5)",
    "delta": "Delta Lake table format (X7/X10 productionization)",
    "pyiceberg": "Iceberg table format",
    "confluent_kafka": "wire-client parity tests (S1-S3)",
    "fastavro": "Avro codec oracle cross-check",
    "avro": "Avro codec oracle cross-check (apache-avro)",
}


def probe() -> dict:
    out = {"packages": {}, "jars": {}, "spark_avro_functions": None, "network": None}
    for mod, why in PKGS.items():
        try:
            importlib.import_module(mod)
            out["packages"][mod] = {"present": True, "unlocks": why}
        except Exception as exc:  # noqa: BLE001 - any import failure means absent
            out["packages"][mod] = {"present": False, "unlocks": why,
                                    "error": type(exc).__name__}
    try:
        import pyspark
        jar_dir = os.path.join(os.path.dirname(pyspark.__file__), "jars")
        for pat, why in [
            ("*sql-kafka*", "format('kafka') datasource (S1/S2 wire path)"),
            ("*kafka-clients*", "kafka wire client"),
            ("spark-avro*", "from_avro/to_avro datasource"),
            ("spark-protobuf*", "from_protobuf/to_protobuf"),
        ]:
            hits = sorted(os.path.basename(p) for p in glob.glob(os.path.join(jar_dir, pat)))
            out["jars"][pat] = {"present": bool(hits), "files": hits, "unlocks": why}
    except Exception as exc:  # noqa: BLE001
        out["jars"]["error"] = type(exc).__name__

    # jar presence is not enough: the avro-1.x core jars ship with Spark but the
    # spark-avro *datasource* does not -- so actually try the function.
    try:
        from pyspark.sql import SparkSession
        spark = (SparkSession.builder.master("local[2]")
                 .config("spark.ui.enabled", "false").getOrCreate())
        try:
            from pyspark.sql.avro.functions import to_avro
            import pyspark.sql.functions as F
            df = spark.range(1).select(F.struct(F.col("id")).alias("v"))
            schema = ('{"type":"record","name":"r","fields":'
                      '[{"name":"id","type":"long"}]}')
            df.select(to_avro("v", schema)).collect()
            out["spark_avro_functions"] = "usable"
        except Exception as exc:  # noqa: BLE001
            out["spark_avro_functions"] = f"unusable ({type(exc).__name__})"
        finally:
            spark.stop()
    except Exception as exc:  # noqa: BLE001
        out["spark_avro_functions"] = f"spark-unavailable ({type(exc).__name__})"

    try:
        socket.create_connection(("repo1.maven.org", 443), timeout=3).close()
        out["network"] = "open"
    except Exception as exc:  # noqa: BLE001
        out["network"] = f"blocked ({type(exc).__name__})"
    return out


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--round", default="manual")
    args = ap.parse_args()
    result = probe()
    result["round"] = args.round
    blocked = [m for m, v in result["packages"].items() if not v["present"]]
    result["summary"] = {
        "absent_packages": blocked,
        "kafka_datasource": result["jars"].get("*sql-kafka*", {}).get("present", False),
        "spark_avro": result["spark_avro_functions"],
        "network": result["network"],
    }
    path = os.path.join(REPO, f"ENVPROBE_r{args.round}.json")
    with open(path, "w") as fh:
        json.dump(result, fh, indent=1, sort_keys=True)
    print(json.dumps(result["summary"], indent=1))
    print(f"wrote {path}", file=sys.stderr)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
