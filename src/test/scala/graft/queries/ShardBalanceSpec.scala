package graft.queries

import graft.SparkSpec

/** E275: the snake deal's reason to exist — its token spread across
  * shards must never be worse than the hash sharding's (E188), and on
  * a length-skewed corpus it should be strictly tighter.
  */
class ShardBalanceSpec extends SparkSpec {

  private def spread(name: String): (Double, Long) = {
    val toks = CurationQueries.queries(name)(spark, sfDir)
      .select("n_tokens").collect().map(_.getLong(0))
    (toks.max.toDouble / toks.min, toks.sum)
  }

  test("snake-by-size token spread is at most the hash sharding's, " +
      "with the same total") {
    val (snake, snakeTotal) = spread("docs_shard_balance")
    val (hashed, hashTotal) = spread("docs_shard_manifest")
    info(f"max/min shard tokens: snake=$snake%.4f hash=$hashed%.4f")
    assert(snakeTotal == hashTotal,
      "the two shardings must partition the same token mass")
    assert(snake <= hashed + 1e-9,
      f"snake deal ($snake%.4f) must not be more skewed than hash " +
        f"sharding ($hashed%.4f)")
  }
}
