"""Launch-mode smoke tests (VERDICT r2 items 6/7):

- spark-submit --py-files: the north rule names this launch mode; it had
  never actually been executed. Build the library zip, run the sf0.001
  flagship entry in a fresh spark-submit subprocess from OUTSIDE the
  repo (so the zip alone must supply the code), and check row parity
  with the in-process entry.
- Iceberg runtime: the readers/writers carry Iceberg branches that the
  sandbox (no Iceberg jar, no network) can never execute; when a runtime
  jar is present (deployment CI, SPARK_GRAFT_ICEBERG_JAR) this smoke
  exercises write_table(fmt='iceberg') + load_documents(fmt='iceberg')
  + snapshot-read resume once, so a deploy doesn't discover a typo'd
  API at the first commit. Skips cleanly otherwise.
"""

import glob
import os
import subprocess
import sys
import zipfile

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
SPARK_SUBMIT = os.path.join(
    os.path.dirname(__import__("pyspark").__file__), "bin", "spark-submit"
)

DRIVER_SCRIPT = """\
from pyspark.sql import SparkSession
spark = SparkSession.builder.getOrCreate()
import __spark_entry__ as E
df = E.entry(spark)
print("ENTRY_ROWS=%d" % df.count())
spark.stop()
"""


def _build_zip(path: str) -> str:
    """Package frizbee_spark + the driver contract module as the
    --py-files artifact (the zip layout pyproject.toml's wheel would
    produce for the pure-Python package)."""
    with zipfile.ZipFile(path, "w", zipfile.ZIP_DEFLATED) as z:
        for f in glob.glob(os.path.join(REPO, "frizbee_spark", "**", "*.py"),
                           recursive=True):
            z.write(f, os.path.relpath(f, REPO))
        z.write(os.path.join(REPO, "__spark_entry__.py"), "__spark_entry__.py")
    return path


@pytest.mark.spark
def test_spark_submit_py_files_entry_parity(spark, tmp_path):
    if not os.path.exists(SPARK_SUBMIT):
        pytest.skip("spark-submit not found")
    dist = _build_zip(str(tmp_path / "frizbee_spark.zip"))
    script = tmp_path / "driver.py"
    script.write_text(DRIVER_SCRIPT)

    # in-process reference rows (shared test session)
    sys.path.insert(0, REPO)
    import __spark_entry__ as E

    expected = E.entry(spark).count()
    from frizbee_spark.util import release_tracked

    release_tracked()

    env = dict(os.environ)
    env.pop("PYTHONPATH", None)  # the zip must be the only code source
    env.setdefault("SPARK_GRAFT_CPUS", "4")
    out = subprocess.run(
        [SPARK_SUBMIT, "--master", "local[4]",
         "--conf", "spark.ui.enabled=false",
         "--conf", "spark.sql.shuffle.partitions=8",
         "--py-files", dist, str(script)],
        capture_output=True, text=True, timeout=600,
        cwd=str(tmp_path), env=env,
    )
    assert out.returncode == 0, out.stderr[-2000:]
    rows = [ln for ln in out.stdout.splitlines() if ln.startswith("ENTRY_ROWS=")]
    assert rows, out.stdout[-2000:]
    assert int(rows[0].split("=")[1]) == expected


def _iceberg_jar() -> str | None:
    explicit = os.environ.get("SPARK_GRAFT_ICEBERG_JAR")
    if explicit and os.path.exists(explicit):
        return explicit
    jar_dir = os.path.join(os.path.dirname(__import__("pyspark").__file__), "jars")
    hits = glob.glob(os.path.join(jar_dir, "iceberg-spark-runtime*.jar"))
    return hits[0] if hits else None


ICEBERG_SCRIPT = """\
import sys
from pyspark.sql import SparkSession

warehouse = sys.argv[1]
spark = (
    SparkSession.builder
    .config("spark.sql.extensions",
            "org.apache.iceberg.spark.extensions.IcebergSparkSessionExtensions")
    .config("spark.sql.catalog.local", "org.apache.iceberg.spark.SparkCatalog")
    .config("spark.sql.catalog.local.type", "hadoop")
    .config("spark.sql.catalog.local.warehouse", warehouse)
    .getOrCreate()
)
from frizbee_spark.sources.readers import load_documents, write_table

spark.sql("CREATE NAMESPACE IF NOT EXISTS local.db")
docs = spark.createDataFrame(
    [(f"https://x/{i}", f"doc {i} text") for i in range(50)], "url string, text string"
)
spark.sql(
    "CREATE TABLE IF NOT EXISTS local.db.documents (url string, text string) USING iceberg"
)
write_table(docs, "local.db.documents", fmt="iceberg")
back = load_documents(spark, "local.db.documents", fmt="iceberg")
assert back.count() == 50
# snapshot-read resume: the committed snapshot id is readable and stable
snap = spark.sql(
    "SELECT snapshot_id FROM local.db.documents.snapshots ORDER BY committed_at DESC LIMIT 1"
).collect()[0][0]
again = (
    spark.read.format("iceberg").option("snapshot-id", snap)
    .load("local.db.documents")
)
assert again.count() == 50
print("ICEBERG_OK")
spark.stop()
"""


def test_iceberg_runtime_smoke(tmp_path):
    jar = _iceberg_jar()
    if jar is None:
        pytest.skip(
            "no Iceberg runtime jar on the classpath (sandbox has no "
            "network); set SPARK_GRAFT_ICEBERG_JAR on a deployment to run "
            "this smoke — see deploy notes in IMPLEMENTATION.md"
        )
    script = tmp_path / "iceberg_smoke.py"
    script.write_text(ICEBERG_SCRIPT)
    env = dict(os.environ)
    env["PYTHONPATH"] = REPO
    out = subprocess.run(
        [SPARK_SUBMIT, "--master", "local[2]", "--jars", jar,
         "--conf", "spark.ui.enabled=false",
         str(script), str(tmp_path / "warehouse")],
        capture_output=True, text=True, timeout=600, env=env,
    )
    assert out.returncode == 0, out.stderr[-2000:]
    assert "ICEBERG_OK" in out.stdout
