package graft.index

import java.nio.file.Files

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.json4s._
import org.json4s.jackson.JsonMethods
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark
import graft.index.sources.{DeltaLog, DeltaTable}

/**
 * Every Delta commit site routes through the shared metaData /
 * protocol builders — this spec replays a table through one verb of
 * each commit class (create, append, overwrite, type widening,
 * restore, SET/UNSET TBLPROPERTIES, ADD/DROP CONSTRAINT, SYNC-adjacent
 * rename) and then audits EVERY `metaData` action the log holds:
 *
 *  - identity: `metaData.id` is minted exactly once, at version 0,
 *    and restated verbatim by every later commit (r12 shipped a real
 *    bug where a widening commit minted a fresh random id);
 *  - completeness: each action carries the full field set the Delta
 *    protocol requires (format block included);
 *  - protocol legality: readerFeatures only at minReaderVersion >= 3,
 *    writerFeatures only at minWriterVersion >= 7, and no commit
 *    bumps the reader floor for a writer-only feature.
 */
class DeltaCommitMetaSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  private def orders =
    spark.read.parquet(s"${TestSpark.sfDir}/orders.parquet")

  private def commitJsons(root: String): Seq[(Long, Seq[JValue])] = {
    val fs = new Path(root).getFileSystem(
      spark.sessionState.newHadoopConf())
    val dir = new Path(root, "_delta_log")
    fs.listStatus(dir).toSeq
      .filter(_.getPath.getName.matches("\\d{20}\\.json"))
      .sortBy(_.getPath.getName)
      .map { st =>
        val v = st.getPath.getName.stripSuffix(".json").toLong
        val in = fs.open(st.getPath)
        val text = try scala.io.Source.fromInputStream(in, "UTF-8").mkString
          finally in.close()
        v -> text.linesIterator.filter(_.nonEmpty)
          .map(JsonMethods.parse(_)).toSeq
      }
  }

  private def metaActions(root: String): Seq[(Long, JValue)] =
    commitJsons(root).flatMap { case (v, lines) =>
      lines.collect { case j if (j \ "metaData") != JNothing =>
        v -> (j \ "metaData")
      }
    }

  private def str(j: JValue): String =
    j match { case JString(s) => s; case other => fail(s"not a string: $other") }

  test("metaData id is minted once and restated verbatim by every verb") {
    val root = Files.createTempDirectory("graft-meta-").toString
    val base = orders.limit(200)
      .select(col("o_orderkey"), col("o_custkey").cast("int").as("cust"),
        col("o_totalprice"))

    DeltaTable.create(base, root)                              // create
    DeltaTable.append(base, root)                              // append (no metaData expected)
    DeltaTable.setTableProperties(spark, root,
      Map("graft.owner" -> "spec"))                            // SET TBLPROPERTIES
    DeltaTable.addCheckConstraint(spark, root,
      "pos_price", "o_totalprice > 0")                         // ADD CONSTRAINT
    DeltaTable.widenColumnTypes(spark, root,
      Map("cust" -> LongType))                                 // type widening
    DeltaTable.create(base, root)                              // overwrite (re-create)
    DeltaTable.dropConstraint(spark, root, "pos_price")        // DROP CONSTRAINT
    DeltaTable.unsetTableProperties(spark, root,
      Set("graft.owner"))                                      // UNSET TBLPROPERTIES
    DeltaTable.restore(spark, root, 3L)                        // RESTORE

    val metas = metaActions(root)
    assert(metas.nonEmpty && metas.head._1 == 0L,
      "version 0 must publish metaData")
    val id0 = str(metas.head._2 \ "id")
    assert(id0.nonEmpty)
    metas.foreach { case (v, m) =>
      assert(str(m \ "id") == id0,
        s"version $v re-minted the table id (${str(m \ "id")} != $id0)")
      // field completeness — the full action the protocol requires
      assert((m \ "schemaString") != JNothing, s"v$v missing schemaString")
      assert((m \ "partitionColumns").isInstanceOf[JArray],
        s"v$v missing partitionColumns")
      assert((m \ "configuration").isInstanceOf[JObject],
        s"v$v missing configuration")
      assert((m \ "createdTime") != JNothing, s"v$v missing createdTime")
      assert(str(m \ "format" \ "provider") == "parquet",
        s"v$v missing format block")
    }
    // every metadata-publishing verb actually published
    assert(metas.size >= 8,
      s"expected metaData from create/properties/constraints/widen/" +
        s"overwrite/restore, saw ${metas.size}")
  }

  test("protocol actions keep feature lists legal for their floors") {
    val root = Files.createTempDirectory("graft-meta-proto-").toString
    val base = orders.limit(100)
      .select(col("o_orderkey"), col("o_custkey").cast("int").as("cust"))
    DeltaTable.create(base, root)
    // writer-only feature: the reader floor must NOT move
    DeltaTable.addCheckConstraint(spark, root, "c1", "o_orderkey IS NOT NULL")
    DeltaTable.widenColumnTypes(spark, root, Map("cust" -> LongType))

    val protos = commitJsons(root).flatMap { case (v, lines) =>
      lines.collect { case j if (j \ "protocol") != JNothing =>
        v -> (j \ "protocol") }
    }
    assert(protos.nonEmpty)
    protos.foreach { case (v, p) =>
      val mr = (p \ "minReaderVersion") match { case JInt(n) => n.toInt
        case other => fail(s"v$v bad minReaderVersion: $other") }
      val mw = (p \ "minWriterVersion") match { case JInt(n) => n.toInt
        case other => fail(s"v$v bad minWriterVersion: $other") }
      assert(((p \ "readerFeatures") != JNothing) == (mr >= 3),
        s"v$v readerFeatures presence must track minReaderVersion>=3 (mr=$mr)")
      assert(((p \ "writerFeatures") != JNothing) == (mw >= 7),
        s"v$v writerFeatures presence must track minWriterVersion>=7 (mw=$mw)")
    }
    // the ADD CONSTRAINT upgrade is writer-only: reader floor stays 1
    val s = DeltaLog.snapshot(spark, root)
    assert(s.minReaderVersion <= 3)
    val constraintProto = protos.find(_._1 == 1L)
    constraintProto.foreach { case (_, p) =>
      assert((p \ "minReaderVersion") == JInt(1),
        "writer-only checkConstraints must not bump the reader floor")
    }
  }
}
