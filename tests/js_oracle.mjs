// Test-only differential oracle: evaluates the reference's documented
// scalar semantics (SURVEY.md §2.3/§2.11, citing /root/reference/src/
// scrapeDocument.ts:192-214 and scrapeDocument/detectors.ts:13-28) in real
// JS so the Python port can be checked byte-for-byte under true JS regex /
// trim / WHATWG-URL behavior. Reads a JSON request on stdin:
//   {"op": "strip"|"meta"|"entities"|"resolve"|"detect_regexes", "args": [...]}
// (batched: args is a list of inputs), writes JSON results on stdout.

const stripHtmlToText = (html) =>
  html
    .replace(/<script\b[^<]*(?:(?!<\/script>)<[^<]*)*<\/script>/gi, '')
    .replace(/<style\b[^<]*(?:(?!<\/style>)<[^<]*)*<\/style>/gi, '')
    .replace(/<[^>]+>/g, ' ')
    .replace(/\s+/g, ' ')
    .trim();

const extractMeta = (html) => {
  const t = html.match(/<title[^>]*>([^<]+)<\/title>/i);
  const d = html.match(/<meta[^>]+name=["']description["'][^>]+content=["']([^"']+)["']/i);
  return [t?.[1]?.trim() ?? null, d?.[1]?.trim() ?? null];
};

const decodeEntities = (v) =>
  v
    .replace(/&amp;/g, '&')
    .replace(/&quot;/g, '"')
    .replace(/&#039;/g, "'")
    .replace(/&lt;/g, '<')
    .replace(/&gt;/g, '>');

const resolve = ([href, base]) => {
  try {
    return new URL(href, base ?? undefined).toString();
  } catch {
    return null;
  }
};

const detectRegexes = ([url, html]) => {
  // first-match href extraction regexes from detectors.ts:53,66,100-102,126-130
  const pick = (re) => html.match(re)?.[1] ?? null;
  return [
    pick(/href=["']([^"']*wpdmdl=\d+[^"']*)["']/i),
    pick(/href=["']([^"']*\.pdf[^"']*)["']/i),
    pick(/href=["'](\/filepro\/document\/\d+\/[^"']+\.pdf)["']/i),
    pick(/href=["'](\/dsweb\/Get\/Document-\d+\/[^"']+\.(pdf|doc|docx|xls|xlsx|ppt|pptx))["']/i),
    pick(/href=["'](\/dsweb\/ServicesLib\/Document-\d+\/[^"']+\.(pdf|doc|docx|xls|xlsx|ppt|pptx))["']/i),
  ];
};

let input = '';
process.stdin.on('data', (c) => (input += c));
process.stdin.on('end', () => {
  const { op, args } = JSON.parse(input);
  const fn = {
    strip: stripHtmlToText,
    meta: extractMeta,
    entities: decodeEntities,
    resolve,
    detect_regexes: detectRegexes,
  }[op];
  process.stdout.write(JSON.stringify(args.map(fn)));
});
