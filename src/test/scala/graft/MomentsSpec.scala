package graft

import org.apache.spark.sql.functions._
import graft.core.Panel
import graft.ops.Moments

class MomentsSpec extends SparkSpec {
  import spark.implicits._

  // pandas reference values for [1.0, 2.0, 3.0, 4.0, 10.0]:
  //   mean=4.0  std=3.535534  skew=1.697056  kurt=3.152
  // (bias-corrected sample moments — verified against pandas 2.x)
  test("sample skew/kurt match pandas bias-corrected moments") {
    val df = Seq(1.0, 2.0, 3.0, 4.0, 10.0).toDF("value")
    val r = df.agg(
      avg($"value").as("mean"),
      stddev_samp($"value").as("std"),
      Moments.sampleSkew($"value").as("skew"),
      Moments.sampleKurt($"value").as("kurt")).head()
    assert(math.abs(r.getDouble(0) - 4.0) < 1e-9)
    assert(math.abs(r.getDouble(1) - 3.5355339059327378) < 1e-9)
    assert(math.abs(r.getDouble(2) - 1.697056274847714) < 1e-6)
    assert(math.abs(r.getDouble(3) - 3.152) < 1e-6)
  }

  test("skew/kurt of constant series is 0.0 like pandas zero-variance branch") {
    val r = Seq.fill(10)(7.0).toDF("value")
      .agg(Moments.sampleSkew($"value"), Moments.sampleKurt($"value")).head()
    assert(r.getDouble(0) == 0.0 && r.getDouble(1) == 0.0)
  }

  test("cross-section dispersion keeps dates whose feature is all-missing") {
    val df = Seq(
      ("2024-01-01 00:00:00", "G1", Some(1.0)), ("2024-01-01 00:00:00", "G2", Some(3.0)),
      ("2024-01-02 00:00:00", "G1", None: Option[Double]), ("2024-01-02 00:00:00", "G2", None))
      .toDF("date", "name", "f1")
    val m = graft.core.Panel.melt(df, "date", Seq("name"), Seq("f1"))
    val d = Moments.crossSectionDispersion(m, "f1").orderBy("date").collect()
    assert(d.length == 2)
    assert(!d(0).isNullAt(1))
    assert(d(1).isNullAt(1)) // all-missing date emits a null row, not no row
  }

  test("skew/kurt null for short series like pandas") {
    val r2 = Seq(1.0, 2.0).toDF("value")
      .agg(Moments.sampleSkew($"value"), Moments.sampleKurt($"value")).head()
    assert(r2.isNullAt(0) && r2.isNullAt(1))
    val r3 = Seq(1.0, 2.0, 3.0).toDF("value")
      .agg(Moments.sampleSkew($"value"), Moments.sampleKurt($"value")).head()
    assert(!r3.isNullAt(0) && r3.isNullAt(1))
  }

  test("melt produces long format and drops nothing") {
    val df = Seq(
      ("2024-01-01 00:00:00", "G1", 1.0, 10.0),
      ("2024-01-02 00:00:00", "G1", 2.0, 20.0)
    ).toDF("date", "name", "f1", "f2")
    val m = Panel.melt(df, "date", Seq("name"), Seq("f1", "f2"))
    assert(m.columns.toSeq == Seq("date", "group_key", "feature", "value"))
    assert(m.count() == 4)
    assert(m.filter($"feature" === "f2" && $"value" === 20.0).count() == 1)
  }

  test("groupKey degenerate case is __ALL__") {
    val df = Seq(("2024-01-01 00:00:00", 1.0)).toDF("date", "f1")
    val m = Panel.melt(df, "date", Seq(), Seq("f1"))
    assert(m.select("group_key").head().getString(0) == "__ALL__")
  }

  test("distribution diagnostics on sf0.001 events returns one row per group") {
    val ev = graft.core.Tables.events(spark, SparkSpec.sf0001)
    val melted = Panel.melt(ev, "ts", Seq("event_type"), Seq("value"))
    val d = Moments.distributionDiagnostics(melted)
    val rows = d.collect()
    assert(rows.length == ev.select("event_type").distinct().count())
    assert(rows.forall(r => !r.isNullAt(r.fieldIndex("mean"))))
  }

  test("cross-section dispersion null when a single group per date") {
    val df = Seq(("2024-01-01 00:00:00", "G1", 1.0)).toDF("date", "name", "f1")
    val m = Panel.melt(df, "date", Seq("name"), Seq("f1"))
    val d = Moments.crossSectionDispersion(m, "f1")
    assert(d.head().isNullAt(1))
  }
}
