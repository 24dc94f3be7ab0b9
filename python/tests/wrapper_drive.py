"""End-to-end drive of the python wrapper over a LIVE py4j gateway.

Launched by graft.index.PythonWrapperSpec, which hosts a
py4j GatewayServer wired to the test JVM's SparkSession:

    python3 wrapper_drive.py <gateway-port> <sf-dir>

The pyspark library is used exactly as a real driver would use it
(pyspark.sql.DataFrame over `_jdf` handles); only the session object is a
shim, because the JVM was started by sbt, not spark-submit. Everything the
wrapper touches — `spark._jvm`, `spark._jsparkSession`, DataFrame
round-trips — is the real py4j surface.

Prints WRAPPER_OK <n_indexes> on success; any failure raises and exits
non-zero (the Scala spec asserts both).
"""
import sys

from py4j.java_gateway import JavaGateway, GatewayParameters, java_import

port = int(sys.argv[1])
sf_dir = sys.argv[2]

gateway = JavaGateway(gateway_parameters=GatewayParameters(
    port=port, auto_convert=True))
jvm = gateway.jvm
# the same imports pyspark's java_gateway registers (PythonUtils lives in
# org.apache.spark.api.python)
java_import(jvm, "org.apache.spark.api.python.*")
java_import(jvm, "org.apache.spark.sql.*")

jspark = gateway.entry_point.getSparkSession()


class ShimSession(object):
    """Just enough SparkSession surface for the wrapper + DataFrame."""
    def __init__(self, jvm, jsession):
        self._jvm = jvm
        self._jsparkSession = jsession
        self._sc = None  # classic DataFrame.__init__ reads it; unused after


spark = ShimSession(jvm, jspark)

from pyspark.sql import DataFrame  # noqa: E402
from graft.graft import Graft  # noqa: E402
from graft.indexconfig import CoveringIndexConfig, IvfIndexConfig  # noqa: E402

g = Graft(spark)

# --- covering index lifecycle through the wrapper
customer = DataFrame(jspark.read().parquet(sf_dir + "/customer.parquet"), spark)
g.create_index(customer, CoveringIndexConfig(
    "py_ci", ["c_nationkey"], ["c_acctbal"]))
n_indexes = g.indexes().count()
assert n_indexes >= 1, "createIndex through the wrapper left no index"
listing = g.index("py_ci")
assert listing.count() == 1

# --- IVF build + ANN search through the wrapper
embeddings = DataFrame(
    jspark.read().parquet(sf_dir + "/embeddings.parquet"), spark)
g.create_index(embeddings, IvfIndexConfig(
    "py_ivf", "vec_id", "embedding", k=4, max_iter=2))
queries = DataFrame(
    jspark.sql("select vec_id as qid, embedding as qv from parquet.`" +
               sf_dir + "/embeddings.parquet` order by vec_id limit 3"),
    spark)
hits = g.ann_search("py_ivf", queries, top_k=3, n_probe=2)
n_hits = hits.count()
assert n_hits == 9, "expected 3 queries x top_k=3 hits, got %d" % n_hits
recall = g.ann_recall("py_ivf", queries, top_k=3, n_probe=4)
assert recall.count() == 3

# --- delete through the wrapper
g.delete_index("py_ci")
g.delete_index("py_ivf")

# --- LakeTable facade: the lakehouse lifecycle from python
import tempfile
from graft import LakeTable

t = LakeTable(spark)
droot = tempfile.mkdtemp(prefix="graft-py-lake-") + "/t"
jdf_even = jspark.sql(
    "select * from parquet.`" + sf_dir + "/customer.parquet` "
    "where c_custkey % 2 = 0")
jdf_odd = jspark.sql(
    "select * from parquet.`" + sf_dir + "/customer.parquet` "
    "where c_custkey % 2 = 1")
nil_seq = jvm.PythonUtils.toSeq([])
cdf_map = jvm.PythonUtils.toScalaMap(
    {"delta.enableChangeDataFeed": "true"})
none = jvm.scala.Option.empty()
jvm.graft.index.sources.DeltaTable.create(
    jdf_even, droot, nil_seq, cdf_map, none)
jvm.graft.index.sources.DeltaTable.append(
    jdf_odd, droot, nil_seq, none, False)

assert t.format_of(droot) == "delta", t.format_of(droot)
n_all = t.read(droot).count()
n_even = DataFrame(jdf_even, spark).count()
assert t.read_as_of(droot, 0).count() == n_even
hist = t.history(droot)
assert hist.count() == 2, "expected 2 history rows"
assert t.changes(droot, 0).count() == n_all - n_even
t.delete_where(droot, "c_nationkey < 3")
n_after = t.read(droot).count()
assert n_after < n_all

# --- row-level UPDATE through the wrapper (DML verb)
def lake_sum():
    t.read(droot)._jdf.createOrReplaceTempView("py_lake_t")
    jrow = jspark.sql(
        "select cast(sum(c_acctbal) as decimal(18,2)) from py_lake_t").head()
    return float(str(jrow.get(0)))

bal_before = lake_sum()
n_updated = t.read(droot).where("c_nationkey = 9").count()
assert n_updated > 0
t.update(droot, "c_nationkey = 9", {"c_acctbal": "c_acctbal + 100"})
bal_after = lake_sum()
assert abs((bal_after - bal_before) - 100.0 * n_updated) < 1e-6, \
    (bal_before, bal_after, n_updated)
assert t.read(droot).count() == n_after

# --- MERGE (CDC upsert) through the wrapper
src = DataFrame(jspark.sql(
    "select * from parquet.`" + sf_dir + "/customer.parquet` "
    "where c_custkey % 7 = 0"), spark)
t.merge(droot, src, ["c_custkey"],
        delete_condition_sql="c_nationkey >= 20")
merged = t.read(droot)
assert merged.where("c_custkey % 7 = 0 and c_nationkey >= 20").count() == 0
n_sev = src.where("c_nationkey < 20").count()
assert merged.where("c_custkey % 7 = 0").count() == n_sev

t.compact(droot)
n_final = t.read(droot).count()
removed = t.cleanup(droot, 0)
assert len(removed) > 0, "cleanup reclaimed nothing"
assert t.read(droot).count() == n_final

# --- inspection surface (jdf access: this session has no local _sc)
jdrow = t.detail(droot)._jdf.head()
assert jdrow.getString(jdrow.fieldIndex("format")) == "delta"
num_files = jdrow.getLong(jdrow.fieldIndex("num_files"))
assert num_files > 0
assert t.inspect(droot, "files").count() == num_files
t.inspect(droot, "partitions")._jdf.createOrReplaceTempView("py_lake_parts")
jprow = jspark.sql("select sum(file_count) from py_lake_parts").head()
assert int(str(jprow.get(0))) == num_files

# --- zero-copy clone
croot = tempfile.mkdtemp(prefix="graft-py-clone-") + "/t"
t.clone(droot, croot)
assert t.read(croot).count() == t.read(droot).count()
assert t.format_of(croot) == "delta"

# --- in-place conversion + stats backfill
pdir = tempfile.mkdtemp(prefix="graft-py-convert-")
DataFrame(jspark.sql(
    "select * from parquet.`" + sf_dir + "/nation.parquet`"), spark) \
    ._jdf.write().mode("overwrite").parquet(pdir + "/t")
t.convert_to_delta(pdir + "/t")
assert t.format_of(pdir + "/t") == "delta"
n_nation = t.read(pdir + "/t").count()
assert n_nation > 0
assert t.compute_stats(pdir + "/t") >= 0
mdir = tempfile.mkdtemp(prefix="graft-py-migrate-")
DataFrame(jspark.sql(
    "select * from parquet.`" + sf_dir + "/region.parquet`"), spark) \
    ._jdf.write().mode("overwrite").parquet(mdir + "/t")
t.migrate_to_iceberg(mdir + "/t")
assert t.format_of(mdir + "/t") == "iceberg"
n_region = t.read(mdir + "/t").count()
assert n_region > 0

# --- iceberg maintenance: a fast append stacks a second manifest, the
# --- rewrite folds it back, and a clean table has zero orphans
irt = mdir + "/t"
jspark.sql("select * from parquet.`" + sf_dir + "/region.parquet`") \
    .write().format("graft-iceberg").mode("append").save(irt)
n_dm = t.inspect(irt, "manifests").where("content = 'data'").count()
assert n_dm >= 2, "append did not fast-append a manifest: %d" % n_dm
assert t.rewrite_manifests(irt) > 0
assert t.inspect(irt, "manifests").where("content = 'data'").count() == 1
assert t.read(irt).count() == 2 * n_region
import time as _time
future = int(_time.time() * 1000) + 60000
assert t.remove_orphans(irt, older_than_ms=future, dry_run=True) == [], \
    "a clean table listed orphans"
t.set_properties(irt, {"owner": "py-etl"})
t.unset_properties(irt, ["owner"])

# --- column DDL from python: add / rename / drop
t.add_column(irt, "score", "double")
assert "score" in [f.name() for f in t.read(irt)._jdf.schema().fields()]
t.rename_column(irt, "score", "score2")
t.drop_column(irt, "score2")
assert "score2" not in [f.name() for f in t.read(irt)._jdf.schema().fields()]
# the multi-column list form lands in ONE commit, nested types included
t.add_columns(irt, ["py_bonus double", "py_tags array<string>"])
names = [f.name() for f in t.read(irt)._jdf.schema().fields()]
assert "py_bonus" in names and "py_tags" in names, names
t.drop_column(irt, "py_bonus")
t.drop_column(irt, "py_tags")

# --- iceberg refs from python: the WAP cycle (incl. the at= pin,
# --- which crosses py4j as java.lang.Long, not Integer)
head_rows = t.read(irt).count()
head_id = t.create_ref(irt, "py_audit", "branch")
t.create_ref(irt, "py_pin", "tag", at=head_id)
jspark.sql("select * from parquet.`" + sf_dir + "/region.parquet`") \
    .write().format("graft-iceberg").option("branch", "py_audit") \
    .mode("append").save(irt)
assert t.read(irt).count() == head_rows, "branch write moved main"
t.fast_forward(irt, "py_audit")
assert t.read(irt).count() == head_rows + n_region
t.drop_ref(irt, "py_audit", "branch")
t.drop_ref(irt, "py_pin", "tag")
# the full ref DDL: OR REPLACE + retention clauses round-trip
t.create_ref_full(irt, "py_keep", "branch", retain_days=7,
                  keep_snapshots=2)
t.create_ref_full(irt, "py_keep", "branch", or_replace=True)
t.drop_ref(irt, "py_keep", "branch")
t.drop_ref(irt, "py_pin", "tag", if_exists=True)  # tolerated

# --- standard provider syntax resolves from python too (registry-based)
bdir = tempfile.mkdtemp(prefix="graft-py-batchfmt-") + "/t"
jspark.sql("select * from parquet.`" + sf_dir + "/nation.parquet`") \
    .write().format("graft-delta").save(bdir)
jread = jspark.read().format("graft-delta").load(bdir)
assert jread.count() == n_nation
assert t.format_of(bdir) == "delta"

# --- the index advisor crosses the bridge: workload in, typed
# --- recommendations out (accepted + governance rejections)
li_df = DataFrame(jspark.read().parquet(sf_dir + "/lineitem.parquet"), spark)
ord_df = DataFrame(jspark.read().parquet(sf_dir + "/orders.parquet"), spark)
recs = g.recommend([DataFrame(
    li_df._jdf.join(ord_df._jdf,
                    li_df._jdf.col("l_orderkey").equalTo(
                        ord_df._jdf.col("o_orderkey"))), spark)])
assert any(r["indexed_columns"] == ["l_orderkey"] and r["accepted"]
           for r in recs), recs
assert all(set(r) == {"table", "index_name", "indexed_columns",
                      "included_columns", "votes", "mechanisms",
                      "accepted", "rejection", "edges"} for r in recs), recs

print("WRAPPER_OK %d" % n_indexes)
