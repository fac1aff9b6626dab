"""Sandbox capability probe for the Kafka round-trip smoke
(``tests/test_kafka_smoke.py``): answers, with evidence, whether a
single-node KRaft broker can be stood up HERE so the smoke could run
unskipped. Run ``python tests/kafka_broker_probe.py``; it prints one
line per prerequisite and a final verdict. Re-run whenever the image
changes.

Checked prerequisites (all four must hold to host + drive a broker):
  1. a Kafka broker distribution (kafka-server-start / kafka.Kafka
     launcher or a kafka_*/libs dir with kafka-server jars),
  2. the spark-sql-kafka-0-10 connector jar on the Spark classpath
     (readStream/format("kafka") fails to resolve without it),
  3. any Python Kafka client (kafka-python / confluent-kafka) as a
     fallback driver,
  4. network egress to fetch any of the above (pip/apt are forbidden
     by the environment contract anyway; this records that even the
     raw download path is closed).

Last probe: 2026-08-17 (round 16 re-run, same result) — all four
prerequisites absent
(no distribution, no connector jar, no client, DNS resolution fails
for pypi.org/archive.apache.org); verdict unchanged since round 5.
The companion protobuf gate re-probed the same day (round 16):
`google` module still absent (ModuleNotFoundError: No module named
'google'), so the session_tracker TWS path stays env-gated.
"""

from __future__ import annotations

import glob
import importlib.util
import os
import shutil
import socket
import sys


def probe() -> dict[str, bool]:
    results: dict[str, bool] = {}

    launcher = shutil.which("kafka-server-start.sh") or shutil.which(
        "kafka-server-start"
    )
    dists = [
        p
        for root in ("/opt", "/usr/local", "/usr/share", os.path.expanduser("~"))
        for p in glob.glob(os.path.join(root, "kafka*"))
        if os.path.isdir(p) and glob.glob(os.path.join(p, "libs", "kafka_*.jar"))
    ]
    results["broker_distribution"] = bool(launcher or dists)
    print(
        f"broker_distribution: {results['broker_distribution']}"
        f" (launcher={launcher!r}, dists={dists!r})"
    )

    spark_home = os.environ.get("SPARK_HOME") or next(
        iter(glob.glob("/opt/spark-*-bin-*")), None
    )
    jars = (
        glob.glob(os.path.join(spark_home, "jars", "*kafka*.jar"))
        if spark_home
        else []
    )
    results["spark_sql_kafka_jar"] = bool(jars)
    print(
        f"spark_sql_kafka_jar: {results['spark_sql_kafka_jar']}"
        f" (SPARK_HOME={spark_home!r}, jars={jars!r})"
    )

    clients = [
        m for m in ("kafka", "confluent_kafka") if importlib.util.find_spec(m)
    ]
    results["python_client"] = bool(clients)
    print(f"python_client: {results['python_client']} (found={clients!r})")

    reachable = False
    for host in ("pypi.org", "archive.apache.org"):
        try:
            s = socket.socket()
            s.settimeout(3)
            s.connect((host, 443))
            s.close()
            reachable = True
            break
        except OSError as e:
            print(f"  egress {host}:443 -> {e}")
    results["network_egress"] = reachable
    print(f"network_egress: {reachable}")

    return results


if __name__ == "__main__":
    r = probe()
    hostable = r["broker_distribution"] and r["spark_sql_kafka_jar"]
    print(
        "VERDICT:",
        "broker hostable — run tests/test_kafka_smoke.py with "
        "SPARK_GRAFT_KAFKA_BOOTSTRAP set"
        if hostable
        else "sandbox CANNOT host a Kafka broker (and cannot fetch one)",
    )
    sys.exit(0 if hostable else 1)
