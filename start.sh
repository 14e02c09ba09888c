#!/bin/bash
# Launch the ETL web API (parity with the reference's start.sh, which
# boots uvicorn): spark-submit wires the JVM module opens and the
# /opt/spark/jars classpath, so the same jar runs on any Spark 4.1
# deployment — local[*] here, a real master via SPARK_MASTER.
set -e
exec /opt/spark/bin/spark-submit \
  --master "${SPARK_MASTER:-local[*]}" \
  --class graft.etl.WebApi \
  /app/lib/*.jar
