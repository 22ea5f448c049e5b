package graft

import graft.queries.LangId
import org.apache.spark.sql.functions._

/** Char-trigram language-ID (LangId): must reach ≥0.9 accuracy on a
  * multilingual fixture with distinct vocabularies — the bar the round-4
  * marker-word heuristic (~0.3 on content) could not clear — and classify
  * degenerate inputs as `und` instead of guessing.
  */
class LangIdSpec extends SparkSpec {

  private val fixture: Seq[(String, String)] = Seq(
    // English
    "en" -> "the quick brown fox jumps over the lazy dog and runs into the forest",
    "en" -> "this is an example of a sentence that was written for testing the classifier",
    "en" -> "machine learning systems are trained with large amounts of text data",
    "en" -> "he was walking to the station when the rain started falling heavily",
    "en" -> "the history of the kingdom is documented in several ancient books",
    "en" -> "we have been working on this project for a long time with great results",
    // German
    "de" -> "der schnelle braune fuchs springt über den faulen hund und läuft in den wald",
    "de" -> "dies ist ein beispiel für einen satz der zum testen geschrieben wurde",
    "de" -> "maschinelles lernen wird mit großen mengen von textdaten trainiert",
    "de" -> "er ging zum bahnhof als der regen anfing stark zu fallen",
    "de" -> "die geschichte des königreichs ist in mehreren alten büchern dokumentiert",
    "de" -> "wir arbeiten seit langer zeit an diesem projekt mit guten ergebnissen",
    // Spanish
    "es" -> "el rápido zorro marrón salta sobre el perro perezoso y corre por el bosque",
    "es" -> "este es un ejemplo de una frase que fue escrita para probar el clasificador",
    "es" -> "los sistemas de aprendizaje se entrenan con grandes cantidades de datos",
    "es" -> "el caminaba hacia la estación cuando la lluvia comenzó a caer con fuerza",
    "es" -> "la historia del reino está documentada en varios libros antiguos",
    "es" -> "hemos estado trabajando en este proyecto durante mucho tiempo con buenos resultados",
    // French
    "fr" -> "le rapide renard brun saute par dessus le chien paresseux et court dans la forêt",
    "fr" -> "ceci est un exemple de phrase qui a été écrite pour tester le classificateur",
    "fr" -> "les systèmes d apprentissage sont entraînés avec de grandes quantités de données",
    "fr" -> "il marchait vers la gare quand la pluie a commencé à tomber fortement",
    "fr" -> "l histoire du royaume est documentée dans plusieurs livres anciens",
    "fr" -> "nous travaillons sur ce projet depuis longtemps avec de bons résultats")

  test("≥0.9 accuracy on a 4-language distinct-vocabulary fixture") {
    import spark.implicits._
    val df = fixture.toDF("lang", "text")
      .withColumn("pred", LangId.langId(col("text")))
    val rows = df.collect()
    val correct = rows.count(r => r.getString(0) == r.getString(2))
    val acc = correct.toDouble / rows.length
    val wrong = rows.filter(r => r.getString(0) != r.getString(2))
      .map(r => s"${r.getString(0)}->${r.getString(2)}: ${r.getString(1).take(40)}")
    assert(acc >= 0.9, s"accuracy $acc\n${wrong.mkString("\n")}")
  }

  test("degenerate inputs → und") {
    import spark.implicits._
    val preds = Seq("", "12345 67890", "!!! ??? ...", "zz")
      .toDF("text")
      .select(LangId.langId(col("text")).as("pred"))
      .collect().map(_.getString(0))
    assert(preds.forall(_ == "und"), preds.mkString(","))
  }

  test("profiles are well-formed: trigram-length entries, no duplicates") {
    LangId.profiles.foreach { case (l, prof) =>
      assert(prof.forall(_.length == 3), s"$l has a non-trigram entry")
      assert(prof.distinct.size == prof.size, s"$l has duplicate trigrams")
    }
  }
}
