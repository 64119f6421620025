package graft.serve

import graft.SparkSpec
import org.apache.spark.sql.functions._

class ProfileSpec extends SparkSpec {
  import spark.implicits._

  test("profile: exact rows/nulls/distincts per column, long format, ordered") {
    val df = Seq(
      (1L, Some("a"), Some(1.0)),
      (2L, Some("a"), None),
      (3L, None, Some(2.0)),
      (4L, Some("b"), Some(2.0))
    ).toDF("id", "s", "v")
    val out = Profile.profile(df, Seq("id", "s", "v"))
      .as[(String, Long, Long, Long, Long)].collect().toSeq
    assert(out === Seq(
      ("id", 4L, 4L, 0L, 4L),
      ("s", 4L, 3L, 1L, 2L),
      ("v", 4L, 3L, 1L, 2L)))
  }

  test("profile rejects unknown and empty column lists") {
    val df = Seq((1, 2)).toDF("a", "b")
    intercept[IllegalArgumentException] { Profile.profile(df, Seq("a", "nope")) }
    intercept[IllegalArgumentException] { Profile.profile(df, Nil) }
  }
}
