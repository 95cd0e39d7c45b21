package graft

import java.math.BigInteger
import java.security.MessageDigest

import org.apache.spark.sql.functions._
import graft.functions.HashFunctions

class HashFunctionsSpec extends SparkSpec {

  /** Independent oracle: full 128-bit md5 int mod N via BigInteger —
    * exactly the reference's `int(md5(id).hexdigest(), 16) % n`
    * (coordinator/main.py:43-45).
    */
  private def oracle(id: String, n: Int): Long = {
    val d = MessageDigest.getInstance("MD5").digest(id.getBytes("UTF-8"))
    new BigInteger(1, d).mod(BigInteger.valueOf(n)).longValueExact()
  }

  test("shardHash replicates int(md5,16) % N exactly") {
    import spark.implicits._
    for (n <- Seq(2, 3, 8, 16, 1000)) {
      val ids = (0 until 200).map(_.toString) ++ Seq("abc", "doc::chunk0::1a2b3c4d", "")
      val df = ids.toDF("id")
      val got = df.select(col("id"), HashFunctions.shardHash(col("id"), n))
        .collect.map(r => r.getString(0) -> r.getLong(1)).toMap
      ids.foreach { id =>
        assert(got(id) == oracle(id, n), s"id=$id n=$n")
      }
    }
  }

  test("shardHash of a bigint column stringifies like the reference client") {
    import spark.implicits._
    val got = Seq(42L).toDF("id")
      .select(HashFunctions.shardHash(col("id"), 8)).head.getLong(0)
    assert(got == oracle("42", 8))
  }
}
