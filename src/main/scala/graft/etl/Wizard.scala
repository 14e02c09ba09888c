package graft.etl

import java.io.{BufferedReader, PrintStream}

/** E2 — interactive wizard mirroring
  * `/root/reference/supercourier_etl/main.py:14-59`: prompts for the
  * source (generate N rows XOR read a file), one of the 8 output format
  * choices, and the output path. Pure function of the input stream so
  * tests can drive it with piped text.
  */
object Wizard {

  val FormatChoices: Seq[String] =
    Seq("csv", "json", "parquet", "sqlite", "xlsx", "all", "all_but_xlsx", "preview")

  def run(in: BufferedReader, out: PrintStream): Cli.Args = {
    def ask(prompt: String, valid: String => Boolean, err: String): String = {
      var line: String = null
      while (line == null) {
        out.print(prompt); out.flush()
        val l = Option(in.readLine()).map(_.trim).getOrElse(
          throw new IllegalStateException("stdin closed"))
        if (valid(l)) line = l else out.println(err)
      }
      line
    }

    val source = ask("Source — [1] generate synthetic rows, [2] read a file: ",
      l => l == "1" || l == "2", "Please answer 1 or 2.")
    val args0 = if (source == "1") {
      val n = ask("How many rows to generate? ",
        l => l.nonEmpty && l.forall(_.isDigit) && l.toLong > 0,
        "Please enter a positive integer.")
      Cli.Args(generateRows = Some(n.toLong))
    } else {
      val p = ask("Path to the source file: ", _.nonEmpty, "Please enter a path.")
      Cli.Args(sourceFile = Some(p))
    }

    val fmt = ask(
      s"Output format ${FormatChoices.mkString("(", " | ", ")")}: ",
      FormatChoices.contains(_),
      s"Please pick one of: ${FormatChoices.mkString(", ")}")
    val path = ask("Output path [data/results]: ", _ => true, "") match {
      case ""  => "data/results"
      case p   => p
    }
    args0.copy(outputPath = path, outputFormat = fmt)
  }
}
