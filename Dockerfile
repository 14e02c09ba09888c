# Container packaging for the graft engine — the Spark-native
# equivalent of the reference's conda/uvicorn image
# (/root/reference/Dockerfile): build the library with sbt in a JDK 17
# stage, then run the web API on an official Apache Spark base so the
# runtime classpath is the same /opt/spark/jars layout the build
# compiles against.

# --- build stage -----------------------------------------------------
FROM apache/spark:4.1.2-java17 AS build
USER root
RUN apt-get update && apt-get install -y --no-install-recommends curl \
  && curl -fsSL https://github.com/sbt/sbt/releases/download/v1.10.7/sbt-1.10.7.tgz \
     | tar -xz -C /usr/local \
  && ln -s /usr/local/sbt/bin/sbt /usr/local/bin/sbt \
  && rm -rf /var/lib/apt/lists/*
WORKDIR /app
COPY build.sbt .
COPY project/ project/
COPY src/ src/
# compile against the image's own Spark jars (unmanagedBase points at
# /opt/spark/jars, which this base image provides)
RUN sbt -batch package

# --- runtime stage ---------------------------------------------------
FROM apache/spark:4.1.2-java17
USER root
WORKDIR /app
COPY --from=build /app/target/scala-2.13/*.jar /app/lib/
COPY start.sh /app/start.sh
RUN chmod +x /app/start.sh

# The web API serves the upload form + POST /run-etl + GET /status +
# GET /download (mirrors the reference api.py surface).
EXPOSE 8000
ENV GRAFT_API_PORT=8000
CMD ["/app/start.sh"]
