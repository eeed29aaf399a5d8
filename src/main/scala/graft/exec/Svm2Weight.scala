package graft.exec

/** Linear-SVM model inspector — the reference ships Joachims'
  * `svm2weight.pl` (`QryEval/svm2weight.pl`) to turn an svm_rank model
  * file into its dense weight vector (`w[a] += alpha * v` over the
  * support-vector lines). Same fixed-header parse, same `i:w` output.
  */
object Svm2Weight {

  /** Dense weight vector (1-based feature ids → index 0 = feature 1). */
  def weights(lines: Seq[String]): Array[Double] = {
    // svm2weight.pl: line 2 is the kernel type, must be 0 (linear); lines
    // 3-10 are skipped; line 11 must be the threshold line.
    require(lines.length > 11, "not an svm_rank model file (too short)")
    require(lines(1).trim.split("\\s+").headOption.exists(_ == "0"),
      "Not linear Kernel!")
    require(lines(10).contains("threshold b"), "Parsing error!")
    val w = scala.collection.mutable.LongMap.empty[Double]
    var maxIdx = 0L
    for (l <- lines.drop(11)) {
      // takeWhile, not split("#")(0): a line of ONLY '#' chars splits to a
      // zero-length array (crash), where the perl script skips it
      val features = l.takeWhile(_ != '#').trim
      if (features.nonEmpty) {
        val parts = features.split("\\s+")
        val alpha = parts(0).toDouble
        parts.iterator.drop(1).foreach { p =>
          val i = p.indexOf(':')
          if (i > 0) {
            val a = p.substring(0, i).toLong
            val v = p.substring(i + 1).toDouble
            w(a) = w.getOrElse(a, 0.0) + alpha * v
            if (a > maxIdx) maxIdx = a
          }
        }
      }
    }
    Array.tabulate(maxIdx.toInt)(i => w.getOrElse(i + 1L, 0.0))
  }

  def main(args: Array[String]): Unit = {
    require(args.length == 1, "usage: Svm2Weight <svm_rank model file>")
    val src = scala.io.Source.fromFile(args(0))
    val ws = try weights(src.getLines().toSeq) finally src.close()
    ws.zipWithIndex.foreach { case (v, i) => println(s"${i + 1}:$v") }
  }
}
