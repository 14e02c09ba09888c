package graft.etl

import java.io.{BufferedReader, ByteArrayOutputStream, PrintStream, StringReader}

import org.scalatest.funsuite.AnyFunSuite

class WizardSpec extends AnyFunSuite {

  private def drive(lines: String*): (Cli.Args, String) = {
    val out = new ByteArrayOutputStream()
    val args = Wizard.run(
      new BufferedReader(new StringReader(lines.mkString("\n") + "\n")),
      new PrintStream(out))
    (args, out.toString)
  }

  test("generate flow with invalid answers re-prompted") {
    val (args, transcript) = drive("9", "1", "abc", "5000", "yaml", "all_but_xlsx", "")
    assert(args.generateRows.contains(5000L))
    assert(args.outputFormat == "all_but_xlsx")
    assert(args.outputPath == "data/results") // default on empty
    assert(transcript.contains("Please answer 1 or 2."))
    assert(transcript.contains("Please enter a positive integer."))
    assert(transcript.contains("Please pick one of:"))
  }

  test("file flow") {
    val (args, _) = drive("2", "/tmp/in.csv", "preview", "/tmp/out/res")
    assert(args.sourceFile.contains("/tmp/in.csv"))
    assert(args.outputFormat == "preview")
    assert(args.outputPath == "/tmp/out/res")
  }
}
