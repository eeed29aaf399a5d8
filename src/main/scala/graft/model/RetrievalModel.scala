package graft.model

/** Retrieval models + parameters (reference:
  * `QryEval/src/RetrievalModelBMxx.java:33-44`,
  * `RetrievalModelIndri.java:33-44`; canonical values
  * `QryEval/parameter.txt:3-7`). Parameters are `Float` on purpose — the
  * reference reads them as floats and several intermediate score terms are
  * float; bit-identical scores require float arithmetic (SURVEY §2.4).
  */
sealed trait RetrievalModel
case object UnrankedBoolean extends RetrievalModel
case object RankedBoolean extends RetrievalModel
final case class BM25(k1: Float = 1.2f, b: Float = 0.75f, k3: Float = 0f)
    extends RetrievalModel
final case class Indri(mu: Float = 2500f, lambda: Float = 0.4f)
    extends RetrievalModel

object RetrievalModel {
  /** `retrievalAlgorithm` param values (`QryEval/src/QryEval.java:103-139`). */
  def fromParams(p: Map[String, String]): RetrievalModel =
    p.getOrElse("retrievalAlgorithm", "UnrankedBoolean") match {
      case "UnrankedBoolean" => UnrankedBoolean
      case "RankedBoolean"   => RankedBoolean
      case "BM25" =>
        BM25(p.getOrElse("BM25:k_1", "1.2").toFloat,
             p.getOrElse("BM25:b", "0.75").toFloat,
             p.getOrElse("BM25:k_3", "0").toFloat)
      case "letor" =>
        // letor is an orchestration (train + rerank), not a scoring model
        // — callers must branch to LeToRRun (Main does); silently scoring
        // plain BM25 here hid the missing E3 path in round 1.
        throw new IllegalArgumentException(
          "retrievalAlgorithm=letor is handled by LeToRRun, not a scoring model")
      case "Indri" =>
        Indri(p.getOrElse("Indri:mu", "2500").toFloat,
              p.getOrElse("Indri:lambda", "0.4").toFloat)
      case other =>
        throw new IllegalArgumentException(s"unknown retrievalAlgorithm $other")
    }
}
