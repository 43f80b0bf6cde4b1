# carrot-transform-spark runtime image (reference parity: the reference ships
# a Dockerfile running its CLI; here the same surface on PySpark).
#
# Build:  docker build -t carrot-transform-spark .
# Run:    docker run --rm -v $PWD/data:/data carrot-transform-spark \
#           run --rules /data/rules.json --inputs /data/csvs \
#           --output /data/out --ddl @carrot/config/ddl.sql \
#           --config @carrot/config/config.json
#
# Spark executes in local mode inside the container; point SPARK_MASTER at a
# cluster (spark:// / yarn / k8s) to scale out — the engine is
# partitioning-safe by construction, nothing in the image pins local mode.

FROM eclipse-temurin:17-jre-jammy

# python for pyspark's driver side
RUN apt-get update \
    && apt-get install -y --no-install-recommends python3 python3-pip \
    && rm -rf /var/lib/apt/lists/* \
    && ln -sf /usr/bin/python3 /usr/local/bin/python

WORKDIR /app
COPY README.md pyproject.toml ./
COPY carrot_transform_spark/ ./carrot_transform_spark/

RUN pip install --no-cache-dir .

ENV SPARK_GRAFT_CPUS=* \
    PYTHONUNBUFFERED=1

ENTRYPOINT ["carrot-transform-spark"]
CMD ["--help"]
