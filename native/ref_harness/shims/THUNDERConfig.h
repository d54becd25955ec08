/* shim: stands in for the cmake-generated THUNDERConfig.h so the
 * reference library can be compiled in place without its build tree */
#define THUNDER_VERSION_MAJOR 1
#define THUNDER_VERSION_MINOR 4
#define THUNDER_VERSION_ADDIT 14
#define COMMIT_VERSION_QUOTE "in-image-parity-build"
#define SINGLE_PRECISION
